package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable Count-Min frequency sketches (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005).
  *
  * Third member of the sketch family ([[HllSketch]] distinct counts,
  * [[DdSketch]] quantiles): per-partition / per-day D×W count matrices
  * answer "how often did key x occur" for ANY x after the fact, merge
  * by matrix addition (commutative/associative → bytes identical
  * under any partitioning), and never touch raw data again on rollup.
  * Guarantees: estimate ≥ true count always (only over-counts on
  * collisions); estimate ≤ true + ε·N with probability 1−δ, ε = e/W,
  * δ = e^−D. W = 1024, D = 4 → ε ≈ 0.27 %, 32 KB per sketch.
  *
  * Hashing: the plan computes ONE codegen'd `xxhash64` per value; the
  * D row positions derive from it via the Kirsch-Mitzenmacher
  * double-hash (h₁ + i·h₂), so the aggregator folds a single long and
  * the whole input path stays inside whole-stage codegen.
  */
object CountMin {

  val W: Int = 1024
  val D: Int = 4
  val Eps: Double = math.E / W
  private val Seed = 7

  private def bytes: Array[Byte] = new Array[Byte](D * W * 8)

  @inline private def getL(a: Array[Byte], i: Int): Long = {
    val o = i * 8
    (a(o) & 0xFFL) | (a(o + 1) & 0xFFL) << 8 | (a(o + 2) & 0xFFL) << 16 |
      (a(o + 3) & 0xFFL) << 24 | (a(o + 4) & 0xFFL) << 32 |
      (a(o + 5) & 0xFFL) << 40 | (a(o + 6) & 0xFFL) << 48 |
      (a(o + 7) & 0xFFL) << 56
  }

  @inline private def putL(a: Array[Byte], i: Int, v: Long): Unit = {
    val o = i * 8
    a(o) = v.toByte; a(o + 1) = (v >> 8).toByte
    a(o + 2) = (v >> 16).toByte; a(o + 3) = (v >> 24).toByte
    a(o + 4) = (v >> 32).toByte; a(o + 5) = (v >> 40).toByte
    a(o + 6) = (v >> 48).toByte; a(o + 7) = (v >> 56).toByte
  }

  /** Row-i cell index from the single 64-bit input hash: h₁ + i·h₂
    * with h₂ forced odd (a zero increment would collapse the rows).
    */
  @inline private def cell(h: Long, row: Int): Int = {
    val h1 = h
    val h2 = (h >>> 32) | 1L
    val p = (h1 + row.toLong * h2) & Long.MaxValue
    row * W + (p % W).toInt
  }

  private def add(a: Array[Byte], h: Long): Array[Byte] = {
    var r = 0
    while (r < D) { val i = cell(h, r); putL(a, i, getL(a, i) + 1L); r += 1 }
    a
  }

  private def addVec(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < D * W) { putL(a, i, getL(a, i) + getL(b, i)); i += 1 }
    a
  }

  /** Point estimate: min over the D row cells (static: codegen target
    * of [[estimate]]).
    */
  def query(a: Array[Byte], h: Long): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < D) { val v = getL(a, cell(h, r)); if (v < m) m = v; r += 1 }
    m
  }

  /** Total items folded in — any row sums to N; row 0 is canonical. */
  def countAll(a: Array[Byte]): Long = {
    var n = 0L
    var i = 0
    while (i < W) { n += getL(a, i); i += 1 }
    n
  }

  private val buildAggregator: Aggregator[Long, Array[Byte], Array[Byte]] =
    new Aggregator[Long, Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = bytes
      def reduce(b: Array[Byte], h: Long): Array[Byte] = add(b, h)
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = addVec(a, b)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  private val mergeAggregator: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = bytes
      def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] = addVec(b, s)
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = addVec(a, b)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Aggregate a column's values into one CM sketch per group. The
    * shuffle carries 32 KB matrices, not rows (partial aggregation).
    */
  def sketchAgg(c: Column): Column =
    udaf(buildAggregator, Encoders.scalaLong).apply(xxhash64(lit(Seed), c))

  /** Aggregate already-built sketches into one. */
  def mergeAgg(c: Column): Column =
    udaf(mergeAggregator, Encoders.BINARY).apply(c)

  /** Estimated count of `value` in the sketch — same in-plan hash as
    * the build side, native codegen'd min-of-rows probe.
    */
  def estimate(sketch: Column, value: Column): Column =
    Bridge.column(CmsQuery(Bridge.expression(sketch),
      Bridge.expression(xxhash64(lit(Seed), value))))

  /** Sketch → total items folded in. */
  def total(c: Column): Column =
    Bridge.column(CmsTotal(Bridge.expression(c)))
}

/** `cms_query(sketch, hash)` — [[CountMin.query]] as a codegen'd
  * Catalyst expression.
  */
case class CmsQuery(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_query"

  override def nullSafeEval(a: Any, h: Any): Any =
    CountMin.query(a.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, h) => s"graft.functions.CountMin.query($a, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}

/** `cms_total(sketch)` — total items folded into the sketch. */
case class CmsTotal(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_total"

  override def nullSafeEval(regs: Any): Any =
    CountMin.countAll(regs.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountMin.countAll($c)")

  override protected def withNewChildInternal(newChild: Expression): CmsTotal =
    copy(child = newChild)
}
