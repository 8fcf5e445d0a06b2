package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("exact profile counts rows, nulls, distincts, extremes per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 10.5), (2L, None, 2.0),
      (3L, Some("b"), 10.5), (4L, Some("a"), -1.25))
      .toDF("id", "tag", "score")
    val p = Profile.profile(df, Seq("id", "tag", "score"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getString(6))).toMap
    assert(p("id") === ((4L, 4L, 0L, 4L, "1", "4")))
    assert(p("tag") === ((4L, 3L, 1L, 2L, "a", "b")))
    assert(p("score") === ((4L, 4L, 0L, 3L, "-1.25", "10.5")))
  }

  test("approx profile: no Expand in the plan, NDV within rsd of exact") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i, i % 977)).toDF("id", "grp")
    val exact = Profile.profile(df, Seq("id", "grp"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val approx = Profile.profile(df, Seq("id", "grp"), exact = false)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    val a = approx.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    for ((c, ex) <- exact)
      assert(math.abs(a(c) - ex).toDouble / ex < 0.15,
        s"$c: approx ${a(c)} vs exact $ex")
    // and the exact mode DOES expand (documenting the cost trade)
    val exPlan = Profile.profile(df, Seq("id", "grp"))
      .queryExecution.executedPlan.toString
    assert(exPlan.contains("Expand"))
  }

  test("unknown and non-identifier columns fail loudly") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
    intercept[IllegalArgumentException](Profile.profile(df, Nil))
  }
}
