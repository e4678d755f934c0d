package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning: filter the fact side with a bloom
  * filter built from the dim side's keys BEFORE the shuffle, then
  * exact-semi-join to remove the false positives.
  *
  * Why this exists at 100 TB: a semi join against a dim that is too
  * big to broadcast shuffles the ENTIRE fact table, even when only a
  * few % of fact rows survive. A bloom prefilter drops non-matching
  * rows at the scan (codegen'd bit test, no shuffle), so the exchange
  * carries only candidates — the manual, reusable form of what
  * Spark's AQE runtime bloom filter injects for eligible plans (and
  * unlike the injected one, the built filter can be persisted and
  * reused across queries/days).
  *
  * Build is distributed (`DataFrameStatFunctions.bloomFilter`
  * aggregates per partition and merges); only the final ~MB sketch
  * lands on the driver — the same materialization shape as Spark's
  * own runtime-filter scalar subquery. Probe is Spark's native
  * `BloomFilterMightContain` over a foldable Literal, so it rides
  * whole-stage codegen; bit-OR construction makes the filter bytes
  * insertion-order-independent.
  *
  * Correctness contract: output EQUALS the plain left-semi join (the
  * bloom can only pass a superset; the exact join removes false
  * positives) — q138's oracle pins exactly that.
  */
object BloomJoin {

  /** Serialized bloom filter of the dim keys, or None when dim is
    * empty (`stat.bloomFilter` has no zero-row representation). The
    * build already scans dim, so the empty probe is not an extra pass
    * worth optimizing away.
    *
    * Both sides go through `xxhash64` BEFORE the filter — build
    * inserts hashes, probe tests hashes — so the key may be ANY
    * orderable type (string/int/date), exactly like Spark's own
    * `InjectRuntimeFilter` wraps the key in `XxHash64`. (Inserting
    * native values and probing a `cast("long")` silently returns an
    * EMPTY result for string keys: the cast yields NULL and the
    * null-intolerant predicate drops every fact row.)
    */
  private def buildFilter(dim: DataFrame, dimKey: String,
                          expectedItems: Long, fpp: Double): Option[Array[Byte]] =
    if (dim.isEmpty) None
    else {
      val bf = dim.stat.bloomFilter(xxhash64(col(dimKey)), expectedItems, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      Some(bos.toByteArray)
    }

  private def probe(bytes: Array[Byte], factKey: String) =
    Bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Bridge.expression(xxhash64(col(factKey)))))

  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
               dimKey: String, expectedItems: Long = 1L << 20,
               fpp: Double = 0.01): DataFrame =
    buildFilter(dim, dimKey, expectedItems, fpp) match {
      case None => fact.limit(0)
      case Some(bytes) =>
        val keys = dim.select(col(dimKey).as("__bloom_key")).distinct()
        fact.filter(probe(bytes, factKey))
          .join(keys, col(factKey) === col("__bloom_key"), "left_semi")
    }

  /** The bloom-pass-only frame (superset with ≤ fpp false positives) —
    * exposed for the spec's containment/measurement assertions.
    */
  def prefilterOnly(fact: DataFrame, factKey: String, dim: DataFrame,
                    dimKey: String, expectedItems: Long = 1L << 20,
                    fpp: Double = 0.01): DataFrame =
    buildFilter(dim, dimKey, expectedItems, fpp) match {
      case None => fact.limit(0)
      case Some(bytes) =>
        fact.filter(probe(bytes, factKey))
    }
}
