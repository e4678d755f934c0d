package graft

/** Drift-proofing gate: executes EVERY `SparkEntry.queries` entry on
  * the sf0.001 testdata and asserts it runs (analysis + execution, no
  * exception). Round 5 shipped with `sbt test` fully green while four
  * production queries were dead at analysis time — the driver had
  * regenerated testdata with `events.ts` re-encoded from
  * TIMESTAMP(NANOS) to plain timestamp[us] (TIMESTAMP_NTZ), and no
  * spec executed the affected queries against the real files. This
  * spec makes any input-schema drift a local test failure instead of
  * a silent per-round correctness regression.
  *
  * One generated test per query so a failure names the query; count()
  * both forces full execution (runtime cast/ANSI errors included) and
  * matches the driver's cheapest smoke contract (rows >= 0).
  */
class AllQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      assert(q(spark, dir).count() >= 0L)
    }
  }
}
