package graft

/** Guards the driver's smoke contract: `SparkEntry.entry` must return
  * rows on the sf0.001 testdata, and every `queries` key must have
  * either an `oracleSql` entry or a documented rows-only gate — a
  * missing oracle for an oracle-able query silently downgrades the
  * driver's correctness check.
  */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name is unique and oracle coverage is explicit") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    // every oracle refers to an existing query
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    // rows-only queries are exactly the known not-SQL-expressible set,
    // and EVERY one names a green oracled companion that gates the
    // same operator behaviorally (planted recall / sketch accuracy /
    // serve fill) — prose in the README is not a gate; this is
    val companions = Map(
      "q33_als_recs" -> "q129_als_coverage",
      "q44_serve_wide" -> "q164_serve_wide_det",
      "q47_embed_lsh" -> "q124_lsh_recall",
      "q57_embed_ivf" -> "q125_ivf_recall",
      "q98_hll_sketch" -> "q128_hll_rollup_accuracy",
      "q121_rolling_distinct" -> "q130_rolling_hll_accuracy")
    val rowsOnly = qs -- os
    assert(rowsOnly == companions.keySet,
      s"unexpected rows-only queries: $rowsOnly")
    companions.foreach { case (q, companion) =>
      assert(os.contains(companion),
        s"rows-only $q names companion $companion which has no oracle")
    }
  }

  test("README query counts match SparkEntry (no hand-count drift)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = raw"(\d+) oracled queries of (\d+)".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README no longer states the query counts")
    assert(m.get.group(1).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.get.group(1)} oracled, actual ${SparkEntry.oracleSql.size}")
    assert(m.get.group(2).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(2)} queries, actual ${SparkEntry.queries.size}")
  }
}
