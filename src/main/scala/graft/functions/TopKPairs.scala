package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregation buffer: two parallel primitive arrays
  * kept sorted by (score desc, id asc), length ≤ k. Insertion is a
  * short shift (k is small — ranks, probes, recommendations); no
  * per-row allocation, no boxing.
  *
  * Arrays are allocated LAZILY (min(k, 8) slots, doubling up to k):
  * a hash-aggregation map holding millions of group buffers would
  * otherwise pay the full 2·k·8 bytes per group regardless of fill —
  * at k=100 that is ~7 GB per 4M-group task eagerly vs ~hundreds of
  * MB for sparsely-filled groups.
  *
  * Score ordering matches Spark's double ordering exactly
  * (`SQLOrderingUtil.compareDoubles`: `if (x == y) 0 else
  * Double.compare(x, y)`) — NaN sorts LARGEST and -0.0 == 0.0 — so
  * ranks agree with the `row_number` window contract even on NaN
  * scores (zero-norm embeddings can yield NaN cosines at the operator
  * boundary).
  */
final class TopKPairsBuffer(val k: Int) {
  var n: Int = 0
  var scores = new Array[Double](math.min(k, 8))
  var ids = new Array[Long](math.min(k, 8))

  // Spark's SQLOrderingUtil.compareDoubles: -0.0 == 0.0, NaN largest
  private def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  private def ensure(cap: Int): Unit =
    if (scores.length < cap) {
      val c = math.min(k, math.max(cap, scores.length * 2))
      scores = java.util.Arrays.copyOf(scores, c)
      ids = java.util.Arrays.copyOf(ids, c)
    }

  def insert(s: Double, id: Long): Unit = {
    if (n == k) {
      val c = cmp(s, scores(k - 1))
      // ranks at-or-after the current last element → not in the top-k
      if (c < 0 || (c == 0 && id >= ids(k - 1))) return
      n -= 1
    } else ensure(n + 1)
    var i = n
    while (i > 0 && {
      val c = cmp(scores(i - 1), s); c < 0 || (c == 0 && ids(i - 1) > id)
    }) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(i) = s; ids(i) = id; n += 1
  }
}

/** Native per-group top-k: `TypedImperativeAggregate` over
  * [[TopKPairsBuffer]], emitting the group's top-k (score, id) pairs
  * as a sorted `array<struct<score:double,id:bigint>>` — ordering
  * (score desc, id asc), identical to a `row_number` window over the
  * same keys and to [[graft.operators.TopKAgg.TopK]] (the typed
  * `Aggregator` face of the same contract).
  *
  * Why a THIRD top-k shape exists ([[graft.operators.TopK]] is the
  * window, `TopKAgg.TopK` the typed Aggregator): both bounded forms
  * plan as ObjectHashAggregate with map-side partial aggregation —
  * the property that matters at scale — but the typed Aggregator
  * pays an encoder round-trip per input row (a `ScoredId` object and
  * a cons cell per insert). On n·k-sized inputs that is noise; on a
  * candidate-verify stream it is the whole cost: the sf10 ANN smoke
  * (400k vectors, ~250M candidate pairs) measured the Aggregator form
  * SLOWER than the full-sort window it replaced. This expression
  * evaluates its two children straight off the unsafe row into
  * primitives — per-row cost is a compare (+ rarely a ≤ k-element
  * shift), and the partial-aggregation shuffle still carries ≤ k rows
  * per (mapper, group).
  *
  * Null inputs (either child) are skipped, matching aggregate
  * convention (a group whose scores are all null therefore vanishes —
  * see [[graft.operators.TopKAgg.perGroup]]'s contract note). NaN
  * scores rank largest, matching Spark's double ordering — see
  * [[TopKPairsBuffer]].
  */
case class TopKPairsAgg(score: Expression, id: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("id", LongType),
    containsNull = false)

  override def createAggregationBuffer(): TopKPairsBuffer =
    new TopKPairsBuffer(k)

  override def update(b: TopKPairsBuffer, row: InternalRow): TopKPairsBuffer = {
    val s = score.eval(row)
    val i = id.eval(row)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairsBuffer, o: TopKPairsBuffer): TopKPairsBuffer = {
    var i = 0
    while (i < o.n) { b.insert(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKPairsBuffer): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { out(i) = InternalRow(b.scores(i), b.ids(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKPairsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKPairsBuffer(k)
    val n = bb.getInt
    var i = 0
    // serialized order is already (score desc, id asc), so each insert
    // appends in O(1) and the lazy arrays grow as needed
    while (i < n) { b.insert(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_pairs"
}
