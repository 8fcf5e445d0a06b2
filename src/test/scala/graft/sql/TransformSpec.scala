package graft.sql

import graft.SparkSpec

class TransformSpec extends SparkSpec {

  test("QUALIFY split finds top-level predicate only") {
    val (inner, pred) = QualifyRewrite.split(
      "SELECT a FROM t\nQUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b DESC) = 1")
    assert(inner.trim === "SELECT a FROM t")
    assert(pred === Some("ROW_NUMBER() OVER (PARTITION BY a ORDER BY b DESC) = 1"))

    // inside a string / subquery / identifier → untouched
    assert(QualifyRewrite.split("SELECT 'QUALIFY' AS x FROM t")._2.isEmpty)
    assert(QualifyRewrite.split("SELECT qualify_col FROM t")._2.isEmpty)
    assert(QualifyRewrite.split(
      "SELECT * FROM (SELECT a FROM t QUALIFY rn = 1) s")._2.isEmpty)
    assert(QualifyRewrite.split("-- QUALIFY in comment\nSELECT a FROM t")._2.isEmpty)
    // case-insensitive
    assert(QualifyRewrite.split("SELECT a FROM t qualify rn = 1")._2 === Some("rn = 1"))
  }

  test("QUALIFY executes with latest-per-key semantics over select aliases") {
    import spark.implicits._
    Seq(("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0), ("B", "2024-01-01", 3.0))
      .toDF("sym", "d", "px").createOrReplaceTempView("qual_t")
    // the predicate references the SELECT alias `day` — QUALIFY's
    // evaluate-after-SELECT rule, same shape as prices.sql:14
    val out = Transform.sql(spark,
      """SELECT sym, d AS day, px FROM qual_t
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY sym ORDER BY day DESC) = 1""".stripMargin)
    assert(out.columns.toSeq === Seq("sym", "day", "px"))
    assert(out.as[(String, String, Double)].collect().sorted.toSeq ===
      Seq(("A", "2024-01-02", 2.0), ("B", "2024-01-01", 3.0)))
  }

  test("three-part names resolve to views, struct paths untouched") {
    val sql = "SELECT s.a.b, x FROM `bronze`.`brapi`.`tickers` t " +
      "JOIN bronze.brapi.assets u ON t.k = u.k"
    val out = Transform.resolveTableNames(sql, Map(
      "bronze.brapi.tickers" -> "bronze_brapi_tickers",
      "bronze.brapi.assets" -> "bronze_brapi_assets"))
    assert(out === "SELECT s.a.b, x FROM bronze_brapi_tickers t " +
      "JOIN bronze_brapi_assets u ON t.k = u.k")
  }

  test("reference assets.sql shape runs end-to-end") {
    import spark.implicits._
    Seq(
      ("PETR4", "10.5", "0.2", "1000", "5e9", "l.png", "stock", "2024-05-01 10:00:00"),
      ("PETR4", "10.9", "0.4", "1100", "5e9", "l.png", "stock", "2024-05-02 10:00:00"),
      ("VALE3", "61.0", "-0.1", "900", "9e9", "v.png", "stock", "2024-05-01 10:00:00"))
      .toDF("stocks", "close", "change", "volume", "market_cap", "logo", "asset_type", "loaded_at")
      .createOrReplaceTempView("view_assets")
    // mirrors /root/reference/bronze/assets/assets.sql:1-11 semantics
    val out = Transform.sql(spark,
      """SELECT
        |  stocks
        |  , cast(close as double) as close_price
        |  , cast(change as double) as change_price
        |  , cast(volume as double) as volume
        |  , cast(market_cap as double) as market_cap
        |  , logo
        |  , asset_type
        |  , cast(loaded_at as timestamp) as loaded_at
        |FROM view_assets
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY stocks ORDER BY loaded_at DESC) = 1""".stripMargin)
    val rows = out.selectExpr("stocks", "close_price").as[(String, Double)]
      .collect().sorted.toSeq
    assert(rows === Seq(("PETR4", 10.9), ("VALE3", 61.0)))
  }
}
