package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades (left) and quotes (right) for the classic backward as-of
  private def trades = {
    import spark.implicits._
    Seq(
      (1L, "A", ts("2026-01-01 10:00:00"), 100.0),
      (2L, "A", ts("2026-01-01 10:05:00"), 101.0),
      (3L, "A", ts("2026-01-01 09:00:00"), 99.0), // before any quote
      (4L, "B", ts("2026-01-01 10:00:00"), 50.0),
      (5L, "C", ts("2026-01-01 10:00:00"), 7.0) // key with no quotes at all
    ).toDF("trade_id", "sym", "t_ts", "price")
  }

  private def quotes = {
    import spark.implicits._
    Seq(
      (10L, "A", ts("2026-01-01 09:30:00"), 98.5),
      (11L, "A", ts("2026-01-01 10:00:00"), 100.1), // equal-ts: eligible for trade 1
      (12L, "A", ts("2026-01-01 10:04:00"), 100.9),
      (13L, "B", ts("2026-01-01 08:00:00"), 49.0)
    ).toDF("quote_id", "sym", "q_ts", "bid")
  }

  test("backward matches the latest quote at or before each trade") {
    import spark.implicits._
    val got = AsOfJoin.backward(trades, quotes.drop("quote_id"), Seq("sym"),
        "t_ts", "q_ts", matchedTsCol = Some("q_ts"))
      .select($"trade_id", $"bid", $"q_ts").as[(Long, Option[Double], Option[Timestamp])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some(100.1), Some(ts("2026-01-01 10:00:00"))), // equal ts counts
      (2L, Some(100.9), Some(ts("2026-01-01 10:04:00"))),
      (3L, None, None), // no quote yet
      (4L, Some(49.0), Some(ts("2026-01-01 08:00:00"))),
      (5L, None, None))) // key absent from right side
  }

  test("tolerance nulls out matches further back than the bound") {
    import spark.implicits._
    val got = AsOfJoin.backward(trades, quotes.drop("quote_id"), Seq("sym"),
        "t_ts", "q_ts", tolerance = Some("30 minutes"))
      .select($"trade_id", $"bid").as[(Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    // trade 4's only quote is 2h old → gated to null
    assert(got.find(_._1 == 4L).get._2 === None)
    assert(got.find(_._1 == 1L).get._2 === Some(100.1))
  }

  test("right-side ties resolve by the tiebreak column") {
    import spark.implicits._
    val dupQuotes = Seq(
      (20L, "A", ts("2026-01-01 09:00:00"), 1.0),
      (21L, "A", ts("2026-01-01 09:00:00"), 2.0) // same (sym, ts), higher id
    ).toDF("quote_id", "sym", "q_ts", "bid")
    val back = AsOfJoin.backward(trades.filter($"trade_id" === 1), dupQuotes,
        Seq("sym"), "t_ts", "q_ts", rightTiebreak = Some("quote_id"))
      .select($"bid").as[Double].collect().toSeq
    assert(back === Seq(2.0)) // highest tiebreak wins backward
    val fwd = AsOfJoin.forward(trades.filter($"trade_id" === 3), dupQuotes,
        Seq("sym"), "t_ts", "q_ts", rightTiebreak = Some("quote_id"))
      .select($"bid").as[Double].collect().toSeq
    assert(fwd === Seq(1.0)) // lowest tiebreak wins forward
  }

  test("forward matches the earliest quote at or after each trade") {
    import spark.implicits._
    val got = AsOfJoin.forward(trades, quotes.drop("quote_id"), Seq("sym"),
        "t_ts", "q_ts", matchedTsCol = Some("q_ts"))
      .select($"trade_id", $"bid", $"q_ts").as[(Long, Option[Double], Option[Timestamp])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some(100.1), Some(ts("2026-01-01 10:00:00"))), // equal ts counts
      (2L, None, None), // nothing after 10:05
      (3L, Some(98.5), Some(ts("2026-01-01 09:30:00"))),
      (4L, None, None),
      (5L, None, None)))
  }

  test("agrees with the naive theta-join + top-1 formulation") {
    import spark.implicits._
    val q = quotes.drop("quote_id")
    val viaWindow = AsOfJoin.backward(trades, q, Seq("sym"), "t_ts", "q_ts")
      .select($"trade_id", $"bid").as[(Long, Option[Double])].collect().toSet
    val naive = trades.as("t")
      .join(q.as("q"), $"t.sym" === $"q.sym" && $"q.q_ts" <= $"t.t_ts", "left")
      .groupBy($"t.trade_id")
      .agg(max_by($"q.bid", $"q.q_ts").as("bid"))
      .as[(Long, Option[Double])].collect().toSet
    assert(viaWindow === naive)
  }

  test("bucketed form is row-identical to the plain form under heavy skew") {
    import spark.implicits._
    // one dominating key (~90% of rows), sparse keys, runs of empty
    // buckets (quote gaps much wider than the bucket), boundary-exact
    // timestamps — unique (key, ts) per side keeps both forms
    // deterministic
    val base = ts("2026-01-01 00:00:00").getTime
    def stamp(min: Long) = new Timestamp(base + min * 60000L)
    val rng = new scala.util.Random(7)
    val tradeRows = (0 until 2000).map { i =>
      val sym = if (i % 10 == 0) s"s${i % 7}" else "HOT"
      (i.toLong, sym, stamp(rng.nextInt(5000).toLong), i * 1.0)
    }
    val quoteRows = (0 until 600).map { i =>
      val sym = if (i % 10 == 0) s"s${i % 7}" else "HOT"
      // multiply by 9 → long stretches with no quotes for sparse keys
      (sym, stamp((rng.nextInt(600) * 9).toLong), i * 0.5)
    }.distinct
    val t = tradeRows.toDF("trade_id", "sym", "t_ts", "price")
    val q = quoteRows.toDF("sym", "q_ts", "bid")
      .groupBy($"sym", $"q_ts").agg(max($"bid").as("bid")) // unique (sym, ts)
    for (fwd <- Seq(false, true); tol <- Seq(None, Some("45 minutes"))) {
      def run(d: DataFrame) = d
        .select($"trade_id", $"bid", $"mts").as[(Long, Option[Double], Option[Timestamp])]
        .collect().toSet
      val (plain, bucketed) =
        if (fwd) (
          AsOfJoin.forward(t, q, Seq("sym"), "t_ts", "q_ts",
            tolerance = tol, matchedTsCol = Some("mts")),
          AsOfJoin.forwardBucketed(t, q, Seq("sym"), "t_ts", "q_ts",
            bucketWidthMicros = 30L * 60 * 1000000, tolerance = tol,
            matchedTsCol = Some("mts")))
        else (
          AsOfJoin.backward(t, q, Seq("sym"), "t_ts", "q_ts",
            tolerance = tol, matchedTsCol = Some("mts")),
          AsOfJoin.backwardBucketed(t, q, Seq("sym"), "t_ts", "q_ts",
            bucketWidthMicros = 30L * 60 * 1000000, tolerance = tol,
            matchedTsCol = Some("mts")))
      assert(run(bucketed) === run(plain), s"fwd=$fwd tol=$tol")
    }
  }

  test("payload name collisions fail loudly") {
    import spark.implicits._
    val bad = quotes.withColumnRenamed("bid", "price") // collides with left
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, bad, Seq("sym"), "t_ts", "q_ts")
    }
    assert(e.getMessage.contains("price"))
  }

  test("reserved internal column names fail loudly instead of being overwritten") {
    import spark.implicits._
    val badLeft = trades.withColumn("__side", org.apache.spark.sql.functions.lit(1))
    val eL = intercept[IllegalArgumentException] {
      AsOfJoin.backward(badLeft, quotes, Seq("sym"), "t_ts", "q_ts")
    }
    assert(eL.getMessage.contains("__side"))
    val badRight = quotes.withColumn("__rv", org.apache.spark.sql.functions.lit(1))
    val eR = intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, badRight, Seq("sym"), "t_ts", "q_ts")
    }
    assert(eR.getMessage.contains("__rv"))
  }
}
