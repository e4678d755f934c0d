package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Per-group top-k as a typed `Aggregator` (SURVEY §7.3's "top-k
  * without a full window sort", the optional custom-aggregate path).
  *
  * Why next to [[TopK.perGroup]] (window `row_number`): the window
  * version shuffles EVERY row to its group's partition and sorts whole
  * partitions before discarding all but k rows per group. This
  * aggregator keeps a bounded, sorted k-list per group and — because
  * Spark plans typed aggregators with partial aggregation
  * (ObjectHashAggregate) — combines map-side: each input partition
  * ships at most k rows per local group into the shuffle. At 100 TB
  * with small k the shuffle drops from |rows| to ≈ k·|groups seen per
  * mapper| — usually orders of magnitude — and no partition-wide sort
  * ever runs. Ordering: score DESC, id ASC (deterministic ties), the
  * same contract as the window version and the SQL oracle.
  */
object TopKAgg {

  final case class ScoredId(score: Double, id: Long)
  /** Aggregation buffer/output: items sorted by (score desc, id asc),
    * length ≤ k. A Product wrapper keeps encoders on the public API.
    */
  final case class TopList(items: List[ScoredId])

  private def insert(items: List[ScoredId], v: ScoredId, k: Int): List[ScoredId] = {
    val (pre, post) = items.span(x =>
      x.score > v.score || (x.score == v.score && x.id < v.id))
    val merged = pre ::: v :: post
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  final class TopK(k: Int) extends Aggregator[ScoredId, TopList, TopList] {
    override def zero: TopList = TopList(Nil)
    override def reduce(b: TopList, a: ScoredId): TopList =
      TopList(insert(b.items, a, k))
    override def merge(x: TopList, y: TopList): TopList =
      TopList(y.items.foldLeft(x.items)((acc, v) => insert(acc, v, k)))
    override def finish(b: TopList): TopList = b
    override def bufferEncoder: Encoder[TopList] = Encoders.product[TopList]
    override def outputEncoder: Encoder[TopList] = Encoders.product[TopList]
  }

  /** Derived child session per parent session, carrying ONE conf
    * override: `objectHashAggregate.sortBased.fallbackThreshold` raised
    * from Spark's default 128 to 4 Mi. TypedImperativeAggregates plan
    * as ObjectHashAggregate, which abandons hash aggregation for a
    * per-partition SORT once the in-map group count passes the
    * threshold — for the BOUNDED top-k buffers that re-introduces
    * exactly the candidate-wide sort the aggregate exists to avoid
    * (the sf10 ANN smoke measured the difference at ~6×; map-side
    * group count there is the corpus size, 400k at sf10, ~4M at
    * sf100). Buffers are ≤ k (score, id) pairs each and allocated
    * lazily ([[graft.functions.TopKPairsBuffer]]), so even millions of
    * in-map groups are ~100 MB–1 GB per task — safe where it is used.
    *
    * Why a derived session and not a session-global conf (the round-9
    * shape): the threshold is read at ACTION time from the executing
    * DataFrame's session, and a global 4 Mi also disables the
    * sort-fallback memory valve for UNBOUNDED object aggregates
    * (collect_list, percentile) in every other query — an OOM hazard
    * the bounded-buffer reasoning doesn't cover. Rebinding the top-k
    * output plan to the child session scopes the override to queries
    * that actually contain a bounded top-k (downstream composition
    * inherits the left operand's session); everything else keeps the
    * default valve.
    */
  private val tunedSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]()

  /** Shared with other BOUNDED TypedImperativeAggregates whose
    * map-side group count legitimately exceeds Spark's 128-group
    * fallback (e.g. [[graft.functions.ArrayAvgAgg]] over the
    * quantizer's ≤ 131072 cells): rebind the aggregating plan to this
    * session so the raised threshold stays scoped to those queries.
    */
  private[graft] def boundedAggSession(spark: SparkSession): SparkSession =
    topkSession(spark)

  private def topkSession(spark: SparkSession): SparkSession =
    tunedSessions.synchronized {
      var s = tunedSessions.get(spark)
      if (s == null) {
        s = spark.newSession()
        // newSession inherits context-level conf but not runtime
        // conf.set()s made on the parent after creation — carry those
        // over so the child differs in EXACTLY one key (static/
        // non-settable entries are skipped)
        val child = s
        spark.conf.getAll.foreach { case (k, v) =>
          try child.conf.set(k, v)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        s.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          (4 * 1024 * 1024).toString)
        tunedSessions.put(spark, s)
      }
      s
    }

  /** Top-k rows per group by (`scoreCol` desc, `idCol` asc), emitted as
    * (group, rank, id, score) — same shape/contract as
    * [[TopK.perGroup]] modulo the double-cast score.
    *
    * Routed through the native
    * [[graft.functions.TopKPairsAgg]] rather than the typed
    * Aggregator above: same plan shape (ObjectHashAggregate, map-side
    * partial), but the native form evaluates its inputs straight into
    * primitives — the Aggregator's per-row encoder round-trip
    * dominated on candidate-verify streams (see TopKPairsAgg's
    * scaladoc for the sf10 measurement that forced this).
    *
    * Null semantics (differs from the `row_number` window): rows with
    * a null score or id are skipped (aggregate-input convention), so a
    * group whose scores are ALL null disappears from the output,
    * whereas the window ranked it (nulls last). Engine call sites
    * score with non-null expressions (cosines, counts, hashes);
    * callers that need every group preserved must coalesce the score
    * first. NaN scores order LARGEST (ties on id), matching Spark's
    * double ordering.
    */
  def perGroup(df: DataFrame, groupCol: String, scoreCol: String,
               idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    // fail fast on non-integral ids: the buffer carries the id as a
    // long, and a string/struct id would cast to null — which the
    // aggregate SKIPS (see the null-semantics note above), silently
    // returning partial/empty groups. Callers with non-numeric ids
    // must map them through an ordinal first (operators/IdMapping).
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"TopKAgg.perGroup requires an integral id column; '$idCol' is " +
        s"$idType — non-numeric values would cast to null and be " +
        "silently dropped. Map ids to ordinals first (IdMapping).")
    val topk = Bridge.column(graft.functions.TopKPairsAgg(
        Bridge.expression(col(scoreCol).cast("double")),
        Bridge.expression(col(idCol).cast("long")), k)
      .toAggregateExpression())
    Bridge.ofRows(topkSession(df.sparkSession),
        df.groupBy(col(groupCol)).agg(topk.as("_top"))
          .queryExecution.logical)
      .select(col(groupCol), posexplode(col("_top")))
      .select(col(groupCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol),
        col("col.score").as(scoreCol))
  }
}
