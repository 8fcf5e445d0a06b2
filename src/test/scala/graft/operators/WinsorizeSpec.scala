package graft.operators

import graft.SparkSpec

class WinsorizeSpec extends SparkSpec {

  test("clips to per-group percentile bounds, inliers pass through raw") {
    import spark.implicits._
    // group a: 1..100 (p01=1.99, p99=99.01 at 4dp); group b: constant
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0))).toDF("g", "x")
    val out = Winsorize.clip(df, "x", Seq("g"))
      .select($"g", $"x", $"x_w", $"x_clipped")
      .as[(String, Double, Double, Boolean)].collect()
    val a = out.filter(_._1 == "a")
    assert(a.count(_._4) === 2) // exactly the two extremes clip
    assert(a.filter(_._2 == 1.0).head._3 === 1.99)
    assert(a.filter(_._2 == 100.0).head._3 === 99.01)
    // inliers are bit-identical pass-throughs
    assert(a.filter(r => !r._4).forall(r => r._2 == r._3))
    // a constant group never clips (lo == hi == the value)
    assert(out.filter(_._1 == "b").forall(r => !r._4 && r._3 == 5.0))
  }

  test("global bounds when no group columns; invalid ranges fail") {
    import spark.implicits._
    val df = (1 to 50).map(_.toDouble).toDF("x")
    val out = Winsorize.clip(df, "x", lower = 0.1, upper = 0.9)
    assert(out.filter("x_clipped").count() > 0)
    assert(out.count() === 50)
    intercept[IllegalArgumentException] {
      Winsorize.clip(df, "x", lower = 0.9, upper = 0.1)
    }
    ()
  }
}
