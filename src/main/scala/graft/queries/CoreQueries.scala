package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operators from SURVEY.md §2 expressed over the
  * driver's synthetic tables, each paired with a DuckDB oracle in
  * [[oracles]].
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - double aggregates are `round`ed so partial-aggregation order
  *    cannot flip low-order bits;
  *  - every window has a total order (unique tiebreak column);
  *  - column names are aliased identically in Spark and SQL.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1-style multi-key hash aggregate (SURVEY §2.7) — partial+final
    * hash agg, shuffle only on the two low-cardinality group keys.
    * Scale note: map-side combine reduces 100 TB of lineitem to
    * |flags|×|status| rows per task before the shuffle.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 6).as("avg_qty"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** W1: latest-record-per-key window dedup — the reference's signature
    * operator (QUALIFY ROW_NUMBER() = 1, e.g. bronze/assets/assets.sql:11).
    * Tiebreak on the unique order key makes it deterministic.
    * Scale note: one shuffle on o_custkey; no global sort.
    */
  def qW1LatestOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice", $"o_orderdate".cast("date").as("o_orderdate"),
        $"o_orderpriority")
  }

  val qW1LatestOrderSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) WHERE rn = 1""".stripMargin

  /** W1 over the events table with a composite ordering. */
  def qW1LatestEvent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    Tables.load(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
  }

  val qW1LatestEventSql: String =
    """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) WHERE rn = 1""".stripMargin

  def queries: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _),
    "q_w1_latest_order" -> (qW1LatestOrder _),
    "q_w1_latest_event" -> (qW1LatestEvent _))

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q_w1_latest_order" -> qW1LatestOrderSql,
    "q_w1_latest_event" -> qW1LatestEventSql)
}
