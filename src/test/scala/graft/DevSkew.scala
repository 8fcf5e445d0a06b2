package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Dev-only skew benchmark for the as-of join (test sourceset — never
  * ships in the library jar): one dominating key forces the plain
  * union-window form into a single sorted partition, while the bucketed
  * form spreads the same key across time buckets. Run with
  * `Test/runMain graft.DevSkew [nTrades] [hotFraction]`.
  * Both forms are counted twice — second timing reported — to exclude
  * codegen/warmup; row-identity is asserted on a sample.
  */
object DevSkew {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[skew] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val hot = args.lift(1).map(_.toDouble).getOrElse(0.95)
    val spark = GraftSession.local("32")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = 1700000000000000L // fixed epoch micros
    def side(rows: Long, idCol: String) = spark.range(rows)
      .select(
        $"id".as(idCol),
        when(pmod($"id", lit(100)) < lit((hot * 100).toLong), lit("HOT"))
          .otherwise(concat(lit("k"), pmod($"id", lit(997)).cast("string")))
          .as("sym"),
        timestamp_micros(lit(base) + pmod($"id" * 2654435761L, lit(86400000000L)))
          .as(s"${idCol}_ts"))
      .repartition(32)

    val trades = side(n, "trade_id")
    val quotes = side(n / 10, "quote_id")
      .withColumnRenamed("quote_id_ts", "q_ts")
      .withColumn("bid", pmod($"quote_id", lit(1000)).cast("double"))
      .drop("quote_id")
      .groupBy($"sym", $"q_ts").agg(max($"bid").as("bid")) // unique (sym, ts)
      .cache()
    trades.cache(); trades.count(); quotes.count()

    def plain() = AsOfJoin.backward(trades, quotes, Seq("sym"),
      "trade_id_ts", "q_ts")
    def bucketed() = AsOfJoin.backwardBucketed(trades, quotes, Seq("sym"),
      "trade_id_ts", "q_ts", bucketWidthMicros = 3600000000L) // 1h over 24h span

    // force the matched payload: a bare count() lets Catalyst prune the
    // window/carry away and times nothing
    def run(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(hash($"bid", $"trade_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    run(plain()); run(bucketed()) // warm both plans
    val (pc, ph) = time("plain union-window")(run(plain()))
    val (bc, bh) = time("bucketed + carry")(run(bucketed()))
    assert(pc == bc, s"row counts diverge: $pc vs $bc")
    assert(ph == bh, s"payload hashes diverge: $ph vs $bh")
    val sample = plain().filter($"trade_id" % 100000 === 0)
      .select($"trade_id", $"bid").collect().toSet
    val sampleB = bucketed().filter($"trade_id" % 100000 === 0)
      .select($"trade_id", $"bid").collect().toSet
    assert(sample == sampleB, "sampled results diverge")
    System.err.println(s"[skew] rows=$pc identical-on-sample=true")
    spark.stop()
  }
}
