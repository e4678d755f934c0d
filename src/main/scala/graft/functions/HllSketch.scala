package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable HyperLogLog distinct-count sketches.
  *
  * Spark's built-in `approx_count_distinct` is HLL++ internally but
  * never exposes the sketch — you get a number, not a state you can
  * persist. At 100 TB the sketch IS the product: per-partition /
  * per-day sketches are tiny (m bytes), written once, and any later
  * rollup (distinct users per week / per campaign / overall) is a
  * register-wise max over stored sketches — no re-scan of the raw
  * data, ever. This module provides that missing surface:
  *
  *  - [[sketchAgg]]  — aggregate raw values into a sketch (binary)
  *  - [[mergeAgg]]   — aggregate sketches into one sketch
  *  - [[estimate]]   — sketch → approximate distinct count
  *
  * Determinism: input values are hashed with Spark's own `xxhash64`
  * (seed 42); register-wise max is commutative/associative, so the
  * sketch bytes are identical under any partitioning, and
  * sketch(A ∪ B) == merge(sketch(A), sketch(B)) holds EXACTLY
  * (HllSketchSpec asserts bit-equality, not approximate equality).
  *
  * Estimator: standard Flajolet HLL with linear counting below 2.5m.
  * With a 64-bit hash the large-range collision correction is
  * unnecessary. Relative error ≈ 1.04/√m ≈ 1.6% at p=12 (m=4096
  * registers, 4 KB per sketch).
  */
object HllSketch {

  val P: Int = 12
  val M: Int = 1 << P // 4096 registers
  private val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** Fold one 64-bit hash into the register array: the top P bits pick
    * the register, the rank of the remaining bits (position of the
    * first 1, counting from the MSB) is the candidate value.
    */
  private def addHash(regs: Array[Byte], h: Long): Array[Byte] = {
    val idx = (h >>> (64 - P)).toInt
    val rest = h << P
    val rank = (if (rest == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
    regs
  }

  private def maxMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Sketch → estimated distinct count (deterministic given the
    * sketch; pure driver/executor-local arithmetic).
    */
  def count(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = Alpha * M.toDouble * M.toDouble / sum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else e
    math.round(corrected)
  }

  private val buildAggregator: Aggregator[Long, Array[Byte], Array[Byte]] =
    new Aggregator[Long, Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = new Array[Byte](M)
      def reduce(b: Array[Byte], h: Long): Array[Byte] = addHash(b, h)
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = maxMerge(a, b)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  private val mergeAggregator: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = new Array[Byte](M)
      def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] = maxMerge(b, s)
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = maxMerge(a, b)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Aggregate a column's values into one HLL sketch per group.
    * Hashing happens IN the plan (`xxhash64`, codegen'd); the
    * aggregator only folds longs, and partial aggregation applies —
    * the shuffle carries m-byte sketches, not rows.
    */
  def sketchAgg(c: Column): Column =
    udaf(buildAggregator, Encoders.scalaLong).apply(xxhash64(lit(42), c))

  /** Aggregate already-built sketches (e.g. read back from a daily
    * rollup table) into one.
    */
  def mergeAgg(c: Column): Column =
    udaf(mergeAggregator, Encoders.BINARY).apply(c)

  /** Sketch column → estimated distinct count. Native expression, not
    * a UDF: it codegens to a static call on the raw `byte[]` (no row
    * boxing, no encoder round-trip) and keeps the enclosing
    * whole-stage-codegen span intact — it only ever runs on
    * already-aggregated one-row-per-group sketches, but finishing the
    * "no UDF where a native expression fits" contract keeps the rule
    * auditable with a plain grep.
    */
  def estimate(c: Column): Column =
    Bridge.column(HllEstimate(Bridge.expression(c)))
}

/** `hll_estimate(sketch)` — [[HllSketch.count]] as a codegen'd Catalyst
  * expression over the binary register array.
  */
case class HllEstimate(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hll_estimate"

  override def nullSafeEval(regs: Any): Any =
    HllSketch.count(regs.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllSketch.count($c)")

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
