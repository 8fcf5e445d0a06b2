package graft.operators

import scala.util.Random

import graft.SparkSpec

class LatestPerKeySpec extends SparkSpec {

  test("salted two-stage form equals the window form, including heavy skew") {
    import spark.implicits._
    val rnd = new Random(5)
    // 80% of rows share ONE key — the shape that serializes a window plan
    val rows = (0 until 500).map { i =>
      val key = if (rnd.nextInt(5) > 0) "hot" else s"k${rnd.nextInt(20)}"
      (key, rnd.nextInt(1000), i.toLong, rnd.nextDouble())
    }
    val df = rows.toDF("k", "ts", "uid", "v")
    // (ts, uid) is a total order per key: uid is unique
    val viaWindow = LatestPerKey.window(df, Seq("k"), Seq("ts", "uid"))
      .collect().map(_.toString).sorted.toSeq
    val viaSalted = LatestPerKey.salted(df, Seq("k"), Seq("ts", "uid"), salts = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(viaWindow === viaSalted)
    assert(viaWindow.nonEmpty)
  }

  test("composite keys and single salt degenerate correctly") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 10, 1.0), ("a", 1, 20, 2.0), ("a", 2, 5, 3.0), ("b", 1, 7, 4.0))
      .toDF("k1", "k2", "ts", "v")
    val out = LatestPerKey.salted(df, Seq("k1", "k2"), Seq("ts"), salts = 1)
      .select("k1", "k2", "ts", "v")
      .as[(String, Int, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(("a", 1, 20, 2.0), ("a", 2, 5, 3.0), ("b", 1, 7, 4.0)))
  }
}
