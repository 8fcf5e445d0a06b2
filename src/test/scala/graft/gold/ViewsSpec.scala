package graft.gold

import graft.SparkSpec
import graft.catalog.{TableRef, Warehouse}

class ViewsSpec extends SparkSpec {

  test("materialized view: header stripped, three-part refs resolved, refresh overwrites") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-gold"))
    wh.overwrite(TableRef("silver", "brapi", "prices"),
      Seq(("AAAA3", 10.0, 12.0, 9.0, 11.0), ("BBBB4", 20.0, 25.0, 19.0, 24.0))
        .toDF("symbol", "open", "high", "low", "close"))

    // reference-shaped view text (test.sql:1-15 shape, own content)
    val viewSql =
      """CREATE MATERIALIZED VIEW `gold`.`brapi`.`prices` AS
        |SELECT
        |  symbol, open, close,
        |  (close - open) AS intraday_change,
        |  (high - low) AS intraday_range
        |FROM silver.brapi.prices""".stripMargin

    val goldRef = TableRef("gold", "brapi", "prices")
    Views.materialize(spark, wh, goldRef, viewSql)
    val out = wh.read(goldRef)
      .selectExpr("symbol", "intraday_change", "intraday_range")
      .as[(String, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(("AAAA3", 1.0, 3.0), ("BBBB4", 4.0, 6.0)))

    // refresh after upstream change
    wh.overwrite(TableRef("silver", "brapi", "prices"),
      Seq(("CCCC5", 1.0, 2.0, 0.5, 1.5)).toDF("symbol", "open", "high", "low", "close"))
    Views.materialize(spark, wh, goldRef, viewSql)
    assert(wh.read(goldRef).count() === 1)
  }

  test("incremental refresh: equals full recompute, no-op version, delete tombstoning, key moves") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-gincr"))
    val base = TableRef("silver", "g", "rows")
    val gold = TableRef("gold", "g", "latest")
    val viewSql =
      """CREATE MATERIALIZED VIEW gold.g.latest AS
        |SELECT k, seq, v
        |FROM silver.g.rows
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) = 1""".stripMargin
    val mt = new graft.sinks.MergeTable(spark, wh, base, Seq("seq"), None)
    mt.upsert(Seq((1L, 10L, "a1"), (1L, 11L, "a2"), (2L, 20L, "b1"))
      .toDF("k", "seq", "v"))
    Views.materialize(spark, wh, gold, viewSql)
    val v1 = wh.currentVersion(base).get
    // no changes → version echoes back, view untouched
    assert(Views.refreshIncremental(spark, wh, gold, base, v1, viewSql,
      Seq("k"), Seq("seq")) === v1)
    // newer row for k=1, first row for k=3; k=2's gold row must survive
    mt.upsert(Seq((1L, 12L, "a3"), (3L, 30L, "c1")).toDF("k", "seq", "v"))
    val v2 = Views.refreshIncremental(spark, wh, gold, base, v1, viewSql,
      Seq("k"), Seq("seq"))
    assert(v2 === wh.currentVersion(base).get)
    val got = wh.read(gold).as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 12L, "a3"), (2L, 20L, "b1"), (3L, 30L, "c1")))
    // DELETE: the base loses k=2 and k=3 entirely — their gold
    // partitions must be tombstoned (recomputed empty), not left stale
    wh.overwrite(base, Seq((1L, 12L, "a3")).toDF("k", "seq", "v"))
    val v3 = Views.refreshIncremental(spark, wh, gold, base, v2, viewSql,
      Seq("k"), Seq("seq"))
    assert(wh.read(gold).as[(Long, Long, String)].collect().toSet ===
      Set((1L, 12L, "a3")))
    // KEY-MOVING UPDATE: row seq=12 moves from partition k=1 to k=4.
    // The feed's update_pre image marks the OLD partition affected, so
    // k=1's gold row empties out while k=4 materializes — the stale-row
    // hazard of post-image-only feeds
    mt.upsert(Seq((4L, 12L, "m")).toDF("k", "seq", "v"))
    Views.refreshIncremental(spark, wh, gold, base, v3, viewSql,
      Seq("k"), Seq("seq"))
    assert(wh.read(gold).as[(Long, Long, String)].collect().toSet ===
      Set((4L, 12L, "m")))
  }

  test("bodyOf leaves plain SELECT untouched") {
    assert(Views.bodyOf("SELECT 1") === "SELECT 1")
    assert(Views.bodyOf("create or replace view g.b.p as\nSELECT x FROM t")
      === "SELECT x FROM t")
  }

  test("aggregate incremental refresh: delta merge, min/max recompute, emptied groups, validation") {
    import spark.implicits._
    import Views.AggSpec
    val wh = new Warehouse(spark, tmpDir("wh-gagg"))
    val base = TableRef("silver", "g", "sales")
    val gold = TableRef("gold", "g", "sales_stats")
    val specs = Seq(AggSpec("n", "count"), AggSpec("total", "sum", "cents"),
      AggSpec("lo", "min", "cents"), AggSpec("hi", "max", "cents"))
    val mt = new graft.sinks.MergeTable(spark, wh, base, Seq("id"), None)
    mt.upsert(Seq((1L, 10L, 100L), (2L, 10L, 300L), (3L, 20L, 50L),
      (4L, 20L, 70L), (5L, 30L, 500L)).toDF("id", "k", "cents"))
    Views.materializeAgg(spark, wh, gold, base, Seq("k"), specs)
    val v1 = wh.currentVersion(base).get
    // no-op: version echoes back
    assert(Views.refreshIncrementalAgg(spark, wh, gold, base, v1,
      Seq("k"), specs, Seq("id")) === v1)
    // k=10: update (retraction → recompute path); k=20: fully deleted
    // (group must leave the view); k=30: untouched; k=40: brand-new
    // insert-only group (pure merge path incl. min/max)
    mt.upsert(Seq((1L, 10L, 150L)).toDF("id", "k", "cents"))
    wh.deleteWhere(base, $"k" === 20L)
    mt.upsert(Seq((6L, 40L, 10L), (7L, 40L, 30L)).toDF("id", "k", "cents"))
    val v2 = Views.refreshIncrementalAgg(spark, wh, gold, base, v1,
      Seq("k"), specs, Seq("id"))
    assert(v2 === wh.currentVersion(base).get)
    val got = wh.read(gold).as[(Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((10L, 2L, 450L, 150L, 300L), (30L, 1L, 500L, 500L, 500L),
      (40L, 2L, 40L, 10L, 30L)))
    // incremental ≡ full recompute over the final base
    val full = base
    val fullAgg = wh.read(full).groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .count()
    assert(wh.read(gold).count() === fullAgg)
    // sum/count-only view: retractions go through the pure-delta path
    val gold2 = TableRef("gold", "g", "sales_totals")
    val specs2 = Seq(AggSpec("n", "count"), AggSpec("total", "sum", "cents"))
    Views.materializeAgg(spark, wh, gold2, base, Seq("k"), specs2)
    val v3 = wh.currentVersion(base).get
    mt.upsert(Seq((1L, 10L, 250L)).toDF("id", "k", "cents")) // update: -150 +250
    wh.deleteWhere(base, $"k" === 40L)
    Views.refreshIncrementalAgg(spark, wh, gold2, base, v3,
      Seq("k"), specs2, Seq("id"))
    val got2 = wh.read(gold2).as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got2 === Seq((10L, 2L, 550L), (30L, 1L, 500L)))
    // a view without a count column is rejected loudly
    val err = intercept[IllegalArgumentException] {
      Views.materializeAgg(spark, wh, TableRef("gold", "g", "bad"), base,
        Seq("k"), Seq(AggSpec("total", "sum", "cents")))
    }
    assert(err.getMessage.contains("count"))
  }

  test("approx-NDV view maintains HLL sketches; retractions recompute; ≡ full recompute") {
    import spark.implicits._
    import Views.AggSpec
    val wh = new Warehouse(spark, tmpDir("wh-gndv"))
    val base = TableRef("silver", "g", "views")
    val gold = TableRef("gold", "g", "view_ndv")
    val specs = Seq(AggSpec("n", "count"),
      AggSpec("ndv_items", "approx_ndv", "item"))
    val mt = new graft.sinks.MergeTable(spark, wh, base, Seq("id"), None)
    mt.upsert(Seq(
      (1L, 10L, "a"), (2L, 10L, "b"), (3L, 10L, "a"),
      (4L, 20L, "x"), (5L, 20L, "y"),
      (6L, 30L, "z"),
      (7L, 50L, null)).toDF("id", "k", "item"))
    Views.materializeAgg(spark, wh, gold, base, Seq("k"), specs)
    val v1 = wh.currentVersion(base).get
    def readNdv() = wh.read(gold).select("k", "n", "ndv_items")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // at these cardinalities the sketch is in exact (coupon) mode, so
    // the estimates are pinnable; an all-NULL group stores a NULL
    // sketch and derives NDV 0 (the approx_count_distinct convention)
    assert(readNdv() === Seq((10L, 3L, 2L), (20L, 2L, 2L),
      (30L, 1L, 1L), (50L, 1L, 0L)))
    // k=10: insert-only growth (sketch UNION merge path — one dup, one
    // new item); k=20: an update flips an item (retraction → sketches
    // can't subtract → dirty-group base-slice recompute); k=30: fully
    // deleted (group leaves); k=40: brand-new group; k=50: a NULL-only
    // group gains its first real item (NULL stored sketch ∪ delta)
    mt.upsert(Seq((8L, 10L, "c"), (9L, 10L, "b")).toDF("id", "k", "item"))
    mt.upsert(Seq((4L, 20L, "y")).toDF("id", "k", "item")) // x→y: ndv 2→1
    wh.deleteWhere(base, $"k" === 30L)
    mt.upsert(Seq((10L, 40L, "q"), (11L, 40L, "q")).toDF("id", "k", "item"))
    mt.upsert(Seq((12L, 50L, "r")).toDF("id", "k", "item"))
    val v2 = Views.refreshIncrementalAgg(spark, wh, gold, base, v1,
      Seq("k"), specs, Seq("id"))
    assert(v2 === wh.currentVersion(base).get)
    assert(readNdv() === Seq((10L, 5L, 3L), (20L, 2L, 1L),
      (40L, 2L, 1L), (50L, 2L, 1L)))
    // incremental ≡ full recompute: a freshly-materialized twin of the
    // same declaration agrees on every group and estimate
    val fullRef = TableRef("gold", "g", "view_ndv_full")
    Views.materializeAgg(spark, wh, fullRef, base, Seq("k"), specs)
    val full = wh.read(fullRef).select("k", "n", "ndv_items")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(readNdv() === full)
    // the sketch namespace is reserved like avg's component namespace
    val err = intercept[IllegalArgumentException] {
      Views.materializeAgg(spark, wh, TableRef("gold", "g", "bad2"), base,
        Seq("k"), Seq(AggSpec("n", "count"),
          AggSpec("__ndv_sk_x", "sum", "id")))
    }
    assert(err.getMessage.contains("NDV sketch namespace"))
  }

  test("avg view maintains (sum, count) components incl. NULL measures and churn") {
    import spark.implicits._
    import Views.AggSpec
    val wh = new Warehouse(spark, tmpDir("wh-gavg"))
    val base = TableRef("silver", "g", "scores")
    val gold = TableRef("gold", "g", "score_avgs")
    val specs = Seq(AggSpec("n", "count"), AggSpec("mean", "avg", "cents"))
    val mt = new graft.sinks.MergeTable(spark, wh, base, Seq("id"), None)
    // k=10 has a NULL measure (avg skips it), k=20 is ALL-NULL (avg NULL)
    mt.upsert(Seq(
      (1L, 10L, Some(100L)), (2L, 10L, None), (3L, 10L, Some(200L)),
      (4L, 20L, None), (5L, 30L, Some(40L)))
      .toDF("id", "k", "cents"))
    Views.materializeAgg(spark, wh, gold, base, Seq("k"), specs)
    val v1 = wh.currentVersion(base).get
    def view = wh.read(gold)
      .select($"k", $"n", $"mean", $"__avg_sum_mean", $"__avg_cnt_mean")
      .as[(Long, Long, Option[Double], Option[Long], Long)]
      .collect().sortBy(_._1).toSeq
    assert(view === Seq((10L, 3L, Some(150.0), Some(300L), 2L),
      (20L, 1L, None, None, 0L), (30L, 1L, Some(40.0), Some(40L), 1L)))
    // churn: update a measured row, NULL-ify another's measure, give
    // the all-NULL group its first real measure, delete k=30 entirely
    mt.upsert(Seq((1L, 10L, Some(700L)), (3L, 10L, None),
      (4L, 20L, Some(90L))).toDF("id", "k", "cents"))
    wh.deleteWhere(base, $"k" === 30L)
    Views.refreshIncrementalAgg(spark, wh, gold, base, v1,
      Seq("k"), specs, Seq("id"))
    assert(view === Seq((10L, 3L, Some(700.0), Some(700L), 1L),
      (20L, 1L, Some(90.0), Some(90L), 1L)))
    // retract a surviving group's LAST non-null measure through the
    // pure-delta path: the sum component must normalize to NULL (a
    // full recompute's SUM over zero non-null rows), not stay 0
    val v2 = wh.currentVersion(base).get
    mt.upsert(Seq((4L, 20L, Option.empty[Long])).toDF("id", "k", "cents"))
    Views.refreshIncrementalAgg(spark, wh, gold, base, v2,
      Seq("k"), specs, Seq("id"))
    assert(view === Seq((10L, 3L, Some(700.0), Some(700L), 1L),
      (20L, 1L, None, None, 0L)))
    // incremental ≡ full recompute (avg + components) over final state
    val full = wh.read(base).groupBy("k")
      .agg(org.apache.spark.sql.functions.avg($"cents").as("mean"))
      .as[(Long, Option[Double])].collect().toMap
    assert(view.map(r => r._1 -> r._3).toMap === full)
    // avg without an input column is rejected loudly
    val err = intercept[IllegalArgumentException] {
      Views.materializeAgg(spark, wh, TableRef("gold", "g", "bad2"), base,
        Seq("k"), Seq(AggSpec("n", "count"), AggSpec("m", "avg")))
    }
    assert(err.getMessage.contains("input column"))
  }

  test("auto-since aggregate refresh is crash-safe: missed feed re-covered, completed refresh no-ops") {
    import spark.implicits._
    import Views.AggSpec
    val wh = new Warehouse(spark, tmpDir("wh-gagg-auto"))
    val base = TableRef("silver", "g", "ledger")
    val gold = TableRef("gold", "g", "ledger_totals")
    val specs = Seq(AggSpec("n", "count"), AggSpec("total", "sum", "cents"))
    val mt = new graft.sinks.MergeTable(spark, wh, base, Seq("id"), None)
    mt.upsert(Seq((1L, 10L, 100L), (2L, 20L, 50L)).toDF("id", "k", "cents"))
    val v1 = Views.materializeAgg(spark, wh, gold, base, Seq("k"), specs)
    assert(wh.latestCommitMeta(gold, Views.BaseVersionMeta) === Some(v1.toString))
    // crash scenario: the silver merge landed but the refresh never ran
    mt.upsert(Seq((3L, 10L, 25L)).toDF("id", "k", "cents"))
    // the replayed upsert is a no-change merge — an empty feed for any
    // refresh keyed off the pre-upsert version; the auto path reads the
    // view's marker instead and re-covers the missed commits
    mt.upsert(Seq((3L, 10L, 25L)).toDF("id", "k", "cents"))
    Views.refreshIncrementalAggAuto(spark, wh, gold, base, Seq("k"), specs, Seq("id"))
    def read() = wh.read(gold).as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(read() === Seq((10L, 2L, 125L), (20L, 1L, 50L)))
    // replay of an already-completed refresh: marker says up to date → no-op
    val cur = wh.currentVersion(base).get
    assert(Views.refreshIncrementalAggAuto(spark, wh, gold, base,
      Seq("k"), specs, Seq("id")) === cur)
    assert(read() === Seq((10L, 2L, 125L), (20L, 1L, 50L)))
    // an all-cancelled feed (base compaction rewrites bytes, not rows)
    // must still advance the marker via a pure-metadata commit, or a
    // long-running loop re-diffs an ever-growing version range
    wh.compact(base, smallFileBytes = 1L << 30)
    val cur2 = wh.currentVersion(base).get
    assert(cur2 > cur)
    assert(Views.refreshIncrementalAggAuto(spark, wh, gold, base,
      Seq("k"), specs, Seq("id")) === cur2)
    assert(wh.latestCommitMeta(gold, Views.BaseVersionMeta) === Some(cur2.toString))
    assert(read() === Seq((10L, 2L, 125L), (20L, 1L, 50L)))
  }

  test("aggregate refresh NULL edges: NULL group keys survive retraction; NULL measures don't poison sums") {
    import spark.implicits._
    import Views.AggSpec
    val wh = new Warehouse(spark, tmpDir("wh-gagg-null"))
    val base = TableRef("silver", "g", "nullable")
    val gold = TableRef("gold", "g", "nullable_stats")
    val specs = Seq(AggSpec("n", "count"), AggSpec("total", "sum", "cents"),
      AggSpec("lo", "min", "cents"), AggSpec("hi", "max", "cents"))
    val mt = new graft.sinks.MergeTable(spark, wh, base, Seq("id"), None)
    def row(id: Long, k: java.lang.Long, cents: java.lang.Long) = (id, k, cents)
    mt.upsert(Seq(
      row(1L, 10L, 100L), row(2L, 10L, 300L),
      row(3L, null, 40L), row(4L, null, 60L), // NULL group key: legitimate
      row(5L, 20L, 500L)).toDF("id", "k", "cents"))
    val v1 = Views.materializeAgg(spark, wh, gold, base, Seq("k"), specs)
    // retract ONE row of the NULL group (min/max view -> recompute
    // path); the group still has a survivor and must keep its row
    wh.deleteWhere(base, $"id" === 3L)
    // and insert an all-NULL-measure row into group 10: the SUM delta
    // is NULL and must not null the stored sum
    mt.upsert(Seq(row(6L, 10L, null)).toDF("id", "k", "cents"))
    Views.refreshIncrementalAgg(spark, wh, gold, base, v1,
      Seq("k"), specs, Seq("id"))
    val got = wh.read(gold)
      .selectExpr("k", "n", "total", "lo", "hi")
      .collect().map(r => (Option(r.get(0)), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .sortBy(_._1.map(_.toString).getOrElse("")).toSeq
    val full = wh.read(base).groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("cents").as("total"),
        org.apache.spark.sql.functions.min("cents").as("lo"),
        org.apache.spark.sql.functions.max("cents").as("hi"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .sortBy(_._1.map(_.toString).getOrElse("")).toSeq
    assert(got === full)
    // explicit expectations, so the invariant check can't mask a shared bug
    assert(got.exists { case (k, n, total, _, _) =>
      k.isEmpty && n == 1L && total.contains(60L) }) // NULL group survived
    assert(got.exists { case (k, n, total, _, _) =>
      k.contains(10L) && n == 3L && total.contains(400L) }) // sum not poisoned
  }
}
