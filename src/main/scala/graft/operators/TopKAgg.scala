package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

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
    */
  def perGroup(df: DataFrame, groupCol: String, scoreCol: String,
               idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val topk = Bridge.column(graft.functions.TopKPairsAgg(
        Bridge.expression(col(scoreCol).cast("double")),
        Bridge.expression(col(idCol).cast("long")), k)
      .toAggregateExpression())
    df.groupBy(col(groupCol)).agg(topk.as("_top"))
      .select(col(groupCol), posexplode(col("_top")))
      .select(col(groupCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol),
        col("col.score").as(scoreCol))
  }
}
