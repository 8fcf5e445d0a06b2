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

  test("bodyOf leaves plain SELECT untouched") {
    assert(Views.bodyOf("SELECT 1") === "SELECT 1")
    assert(Views.bodyOf("create or replace view g.b.p as\nSELECT x FROM t")
      === "SELECT x FROM t")
  }
}
