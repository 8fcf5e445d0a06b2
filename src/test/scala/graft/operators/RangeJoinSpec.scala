package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def points = {
    import spark.implicits._
    Seq(
      (1L, "a", 5L),
      (2L, "a", 10L),  // on an interval's start bound
      (3L, "a", 20L),  // on an interval's end bound
      (4L, "a", 21L),  // just past the end
      (5L, "b", 5L),   // right key, interval belongs to "a"
      (6L, "c", 100L)  // key with no intervals
    ).toDF("pid", "k", "x")
  }

  private def intervals = {
    import spark.implicits._
    Seq(
      (10L, "a", 10L, 20L),
      (11L, "a", 0L, 6L),   // overlaps point 1 and 5's value but key-scoped
      (12L, "b", 0L, 3L)
    ).toDF("iid", "k", "s", "e")
  }

  test("point-in-interval matches inclusive bounds per key, once each") {
    import spark.implicits._
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "x", "s", "e",
        binWidth = 4)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 11L), (2L, 10L), (3L, 10L)))
  }

  test("agrees with the naive theta join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ps = (1 to 300).map(i => (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
      .toDF("pid", "k", "x")
    val is = (1 to 100).map { i =>
      val s = rnd.nextInt(950).toLong
      (i.toLong, s"k${rnd.nextInt(5)}", s, s + rnd.nextInt(50).toLong)
    }.toDF("iid", "k", "s", "e")
    val binned = RangeJoin.pointInInterval(ps, is, Seq("k"), "x", "s", "e", binWidth = 32)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = ps.join(is, Seq("k")).filter($"x" >= $"s" && $"x" <= $"e")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(binned === naive)
  }

  test("interval overlap: inclusive bounds, exactly-once across shared bins") {
    import spark.implicits._
    val l = Seq(
      (1L, "a", 0L, 100L),   // spans many bins
      (2L, "a", 50L, 60L),
      (3L, "b", 0L, 10L)
    ).toDF("lid", "k", "ls", "le")
    val r = Seq(
      (10L, "a", 90L, 200L), // overlaps 1 only
      (11L, "a", 55L, 58L),  // inside both 1 and 2
      (12L, "a", 101L, 110L),// touches nothing (1 ends at 100, inclusive? 101 > 100)
      (13L, "b", 10L, 20L)   // touches 3 at the inclusive bound
    ).toDF("rid", "k", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re",
        binWidth = 8)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 10L), (1L, 11L), (2L, 11L), (3L, 13L)))
  }

  test("interval overlap agrees with the naive theta join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def mk(n: Int, id0: Int) = (1 to n).map { i =>
      val s = rnd.nextInt(900).toLong
      (id0 + i.toLong, s"k${rnd.nextInt(4)}", s, s + rnd.nextInt(80).toLong)
    }
    val l = mk(150, 0).toDF("lid", "k", "ls", "le")
    val r = mk(150, 1000).toDF("rid", "k", "rs", "re")
    val binned = RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re",
        binWidth = 64)
      .select($"lid", $"rid").as[(Long, Long)].collect()
    val naive = l.join(r, Seq("k"))
      .filter($"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid").as[(Long, Long)].collect()
    assert(binned.sorted.toSeq === naive.sorted.toSeq) // exactly-once, no dups
  }

  test("degenerate intervals fail loudly instead of fanning out") {
    import spark.implicits._
    val huge = Seq((1L, "a", 0L, 10000000L)).toDF("iid", "k", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, huge, Seq("k"), "x", "s", "e",
        binWidth = 4, maxBinsPerInterval = 100).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bins")))
  }
}
