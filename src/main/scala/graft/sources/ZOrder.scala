package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton-curve) data layout for multi-column skipping.
  *
  * At 100 TB the cheapest query is the one that never reads the data:
  * parquet min/max row-group stats prune files, but a layout sorted by
  * ONE column leaves every other filter column's min/max spanning the
  * whole domain — a `suppkey` predicate over a `partkey`-sorted table
  * reads everything. Interleaving the bits of both (rank-scaled)
  * columns gives each output file a compact rectangle in the 2-D key
  * space, so min/max stats prune on EITHER column (the technique
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`; ZOrderSpec measures the
  * file-overlap win directly).
  *
  *  - [[zvalue]]      — codegen'd Morton interleave of two scaled cols
  *  - [[scaled]]      — min/max linear scale to 16 bits, in-plan
  *                      (integer arithmetic only, so the DuckDB oracle
  *                      reproduces it bit-for-bit)
  *  - [[zorderWrite]] — range-partition by z-value and write parquet
  *
  * Scaling note: linear min/max scaling is one agg scan and fully
  * deterministic; heavily skewed columns would want sampled-quantile
  * rank scaling instead (same write path, different `scaled`) — the
  * trade-off is documented rather than hidden, and the skipping
  * measurement in ZOrderSpec is the gate either way.
  */
object ZOrder {

  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * value (standard Morton bit-twiddling; static so codegen calls it
    * directly).
    */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton-interleave two 16-bit scaled values: x takes even bits, y
    * odd bits → a 32-bit z-value.
    */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** z-value of two already-scaled (0..65535) columns. */
  def zvalue(x: Column, y: Column): Column =
    Bridge.column(ZInterleave(Bridge.expression(x), Bridge.expression(y)))

  /** Min/max scale of a column to 0..65535 — `⌊(v−min)·65535 /
    * max(max−min, 1)⌋`. The numerator is ≤ 65535·(max−min) ≪ 2^53, so
    * the double quotient's error (~1 ulp) is orders of magnitude below
    * the 1/denominator gap between representable quotients — the floor
    * equals exact integer division on every engine. `mn`/`mx` are
    * 1-row aggregate columns cross-joined in by the caller (no driver
    * collect).
    */
  def scaled(v: Column, mn: Column, mx: Column): Column =
    floor(((v.cast("long") - mn) * 65535L) / greatest(mx - mn, lit(1L)))
      .cast("long")

  /** Attach `zval` interleaving two numeric columns, scaling in-plan:
    * ONE extra aggregate scan for the min/max (broadcast 1-row
    * cross-join), then a scan-local expression — no window, no
    * collect.
    */
  def withZValue(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val mm = df.agg(
      min(col(xCol).cast("long")).as("_mn_x"),
      max(col(xCol).cast("long")).as("_mx_x"),
      min(col(yCol).cast("long")).as("_mn_y"),
      max(col(yCol).cast("long")).as("_mx_y"))
    df.crossJoin(broadcast(mm))
      .withColumn("zval", zvalue(
        scaled(col(xCol), col("_mn_x"), col("_mx_x")),
        scaled(col(yCol), col("_mn_y"), col("_mx_y"))))
      .drop("_mn_x", "_mx_x", "_mn_y", "_mx_y")
  }

  /** Write `df` z-ordered by two columns into `nFiles` parquet files:
    * range-partition on the z-value (sampled range exchange — skew on
    * the curve is absorbed by the sampler) and sort within partitions
    * so row-group min/max stats are tight on BOTH columns.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
                  outPath: String, nFiles: Int): Unit =
    withZValue(df, xCol, yCol)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(outPath)

  /** DuckDB SQL fragment computing [[interleave16]] of two integer SQL
    * expressions — 32 mask-shift-multiply terms generated once, used
    * by the q135 oracle so the z-value itself is hash-checked.
    */
  def interleaveSql(x: String, y: String): String =
    (0 until 16).flatMap { i =>
      Seq(s"((($x >> $i) & 1) * ${1L << (2 * i)})",
          s"((($y >> $i) & 1) * ${2L << (2 * i)})")
    }.mkString(" + ")
}

/** `z_interleave(x, y)` — Morton interleave of the low 16 bits of two
  * longs as a codegen'd Catalyst expression.
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "z_interleave"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.sources.ZOrder.interleave16($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}
