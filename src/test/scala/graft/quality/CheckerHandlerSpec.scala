package graft.quality

import java.time.LocalDate

import graft.SparkSpec
import graft.catalog.{TableRef, Warehouse}
import graft.meta.TableMeta

class CheckerHandlerSpec extends SparkSpec {

  private val runDate = LocalDate.of(2026, 8, 12)

  private val metaYaml =
    """schema:
      |  - name: 'id'
      |    type: 'string'
      |    nullable: false
      |    mandate: 'global_required'
      |    key: true
      |    tests:
      |      - test_type: missing
      |      - test_type: duplicated
      |  - name: 'v'
      |    type: 'double'
      |    mandate: 'local_required'
      |    tests:
      |      - test_type: type_mismatch
      |""".stripMargin

  test("execute: scorecard saved, aggregate computed, upsert merges across runs") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-checks"))
    val meta = TableMeta.fromYamlString(metaYaml)
    val t1 = Seq(("a", "1.5"), ("a", "2.0"), ("b", "x")).toDF("id", "v")
    val t2 = Seq(("k", "3.0")).toDF("id", "v")

    val handler = new CheckerHandler(spark, wh, Seq(
      CheckTarget("silver", "t1", t1, meta),
      CheckTarget("silver", "t2", t2, meta)), runDate)
    val agg = handler.execute()

    // per-row scorecard: (3 + 1) rows × 3 tests, 10 standard columns
    val checks = wh.read(TableRef("silver", "checks", "column_checks"))
    assert(checks.count() === 12)
    // run_date is the partition column → read back last; same set
    assert(checks.columns.toSet === handler.standardColumns.toSet)
    assert(checks.schema("check_score").dataType.typeName === "double")
    assert(checks.schema("run_date").dataType.typeName === "date")

    // aggregate: one row per (test, table); t1 duplicated has 1 failure
    val aggRows = agg.select("table_name", "test_type", "total_score", "passing_cols", "failing_cols")
      .as[(String, String, Double, Long, Long)].collect().toSet
    assert(aggRows.contains(("t1", "duplicated", 2.0 / 3, 2L, 1L)))
    assert(aggRows.contains(("t1", "type_mismatch", 2.0 / 3, 2L, 1L))) // 'x' uncastable
    assert(aggRows.contains(("t2", "missing", 1.0, 1L, 0L)))

    // second run same day: upsert updates in place (no duplicate keys)
    val aggregated = TableRef("silver", "checks", "aggregated_checks")
    val before = wh.read(aggregated).count()
    new CheckerHandler(spark, wh, Seq(
      CheckTarget("silver", "t1", t1, meta),
      CheckTarget("silver", "t2", t2, meta)), runDate).execute()
    assert(wh.read(aggregated).count() === before)

    // next-day run: new run_date rows insert alongside
    new CheckerHandler(spark, wh, Seq(
      CheckTarget("silver", "t1", t1, meta)), runDate.plusDays(1)).execute()
    assert(wh.read(aggregated).count() === before + 3)

    // the rebalance-sized save writes ONE right-sized file per static
    // partition at this scale — not one tiny file per shuffle partition
    // (the 12.7s-of-driver-bench pathology this guards against).
    // Counted through the CURRENT version (dataFiles), not a directory
    // walk: earlier runs' retired files legitimately stay on disk until
    // vacuum (reader snapshot retention)
    assert(wh.dataFiles(TableRef("silver", "checks", "column_checks")).size === 1)

    // each run left a parseable JSON-lines run record with the observed
    // scorecard row count
    val records = spark.read.json(s"${wh.root}/_logs/*.jsonl")
    assert(!records.columns.contains("_corrupt_record"))
    val runs = records.filter($"event" === "checker_done")
      .selectExpr("`rows`", "outcome").as[(Long, String)].collect().toSeq
    assert(runs.map(_._1).sorted === Seq(9L, 12L, 12L)) // 2 full runs + t1-only day-2
    assert(runs.forall(_._2 == "ok"))
  }

  test("a broken target fails the run loudly but names the table") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-checks-bad"))
    val meta = TableMeta.fromYamlString(metaYaml)
    val bad = Seq(("only_wrong_col", "v")).toDF("wrong", "cols")
    val e = intercept[RuntimeException] {
      new CheckerHandler(spark, wh, Seq(
        CheckTarget("silver", "bad", bad, meta)), runDate).execute()
    }
    assert(e.getMessage.contains("silver.bad"))
  }
}
