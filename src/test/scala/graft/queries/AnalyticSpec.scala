package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bounds for the approximate aggregates that the gate only
  * rows-checks (sketch internals are engine-specific by design).
  */
class AnalyticSpec extends SparkSpec {

  test("approx_count_distinct lands within its error bound") {
    import spark.implicits._
    val df = spark.range(0, 100000).toDF("id")
      .withColumn("k", $"id" % 12345)
    val (approx, exact) = df.select(
      approx_count_distinct($"k", 0.01).as("a"),
      countDistinct($"k").as("e")).as[(Long, Long)].head()
    assert(exact === 12345L)
    // rsd 0.01 → generous 5% envelope
    assert(math.abs(approx - exact) <= exact * 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    import spark.implicits._
    val df = spark.range(0, 100000).toDF("id")
      .withColumn("v", $"id".cast("double"))
    val (approx, exact) = df.select(
      expr("approx_percentile(v, 0.9, 10000)").as("a"),
      expr("percentile(v, 0.9)").as("e")).as[(Double, Double)].head()
    assert(math.abs(approx - exact) <= 100000 * 0.01, // accuracy 10000 → 1%
      s"approx=$approx exact=$exact")
  }
}
