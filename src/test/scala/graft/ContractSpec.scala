package graft

/** Guards on the driver contract itself: every oracle belongs to a
  * declared query, names stay kebab-consistent, and the flagship entry
  * smoke (driver t1) returns rows before the driver has to find out.
  */
class ContractSpec extends SparkSpec {

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are unique across the contributing modules") {
    // Map ++ silently drops duplicates — rebuild from the parts and count
    val parts = Seq(
      graft.queries.CoreQueries.queries, graft.queries.RelationalQueries.queries,
      graft.queries.QualityQueries.queries, graft.queries.TextQueries.queries,
      graft.queries.DedupQueries.queries, graft.queries.SimQueries.queries,
      graft.queries.MultimodalQueries.queries, graft.queries.PipelineQueries.queries,
      graft.queries.AnalyticQueries.queries, graft.queries.StreamingQueries.queries)
    val all = parts.flatMap(_.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(all.size === SparkEntry.queries.size)
  }

  test("flagship entry returns rows at sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("value-checked coverage stays at the recorded level") {
    // 155 queries / 155 oracles as of round 15 (every gate value-checked)
    // — a later change that drops an oracle or query should be a
    // conscious decision, not a drive-by
    assert(SparkEntry.queries.size >= 155, s"queries: ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 155, s"oracles: ${SparkEntry.oracleSql.size}")
  }
}
