package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.catalog.{TableRef, Warehouse}

/** Dev-only profiler for the warehouse WRITE path (test sourceset):
  * breaks one small overwrite/append/merge into its job count and
  * wall-clock, at the sqlfam fixture's scale (1000-row slice), so the
  * fixed per-write overhead that multiplies across ~40 fixture phases
  * is attributable. Run with `Test/runMain graft.DevWriteProfile <sfDir>`.
  */
object DevWriteProfile {
  @volatile private var jobs = 0
  private def time[A](label: String)(f: => A): A = {
    val j0 = jobs
    val p0 = graft.util.PhaseTimer.snapshot
    val t0 = System.nanoTime()
    val r = f
    val ph = graft.util.PhaseTimer.snapshot.toSeq.flatMap { case (k, v) =>
      val d = v - p0.getOrElse(k, 0.0)
      if (d > 0.005) Some(f"$k=$d%.2f") else None
    }.sorted.mkString(" ")
    System.err.println(f"[wprofile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs  jobs=${jobs - j0}  $ph")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val base = Files.createTempDirectory("graft-wprofile").toString
    val wh = new Warehouse(spark, s"$base/wh")
    graft.util.Scratch.narrowShuffle(spark) {
      val slice = Tables.load(spark, sfDir, "orders")
        .filter($"o_orderkey" <= 1000)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .cache()
      time("slice cache+count")(slice.count())
      // raw parquet write of the same frame — the floor
      time("raw parquet write x8 files")(
        slice.repartitionByRange(8, $"o_orderkey")
          .write.mode("overwrite").parquet(s"$base/raw8"))
      time("raw parquet write x1 file")(
        slice.coalesce(1).write.mode("overwrite").parquet(s"$base/raw1"))
      // warehouse writes
      time("overwrite bootstrap, stats")(
        wh.overwrite(TableRef("s", "f", "t1"),
          slice.repartitionByRange(8, $"o_orderkey"),
          statsColumns = Seq("o_orderkey")))
      time("overwrite bootstrap, stats+bloom")(
        wh.overwrite(TableRef("s", "f", "t2"),
          slice.repartition(8, $"o_custkey"),
          statsColumns = Seq("o_orderkey"), bloomColumns = Seq("o_orderkey")))
      time("overwrite bootstrap, no stats")(
        wh.overwrite(TableRef("s", "f", "t3"), slice.repartition(2)))
      time("overwrite REPLACE, stats")(
        wh.overwrite(TableRef("s", "f", "t1"),
          slice.repartitionByRange(8, $"o_orderkey"),
          statsColumns = Seq("o_orderkey")))
      time("overwrite bootstrap, partitioned")(
        wh.overwrite(TableRef("s", "f", "t4"),
          slice.select($"o_orderkey", $"o_totalprice",
            concat(lit("g"), $"o_orderkey" % 4).as("seg")).repartition(2),
          partitionBy = Seq("seg")))
      time("append small")(
        wh.append(TableRef("s", "f", "t1"),
          Seq((2000L, 1L, 1.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")))
      val mt = new graft.sinks.MergeTable(spark, wh,
        TableRef("s", "f", "t1"), Seq("o_orderkey"), None)
      time("merge upsert 100 rows")(
        mt.upsert(slice.filter($"o_orderkey" <= 100)
          .withColumn("o_totalprice", $"o_totalprice" + 1.0)))
      time("deleteWhere")(
        wh.deleteWhere(TableRef("s", "f", "t1"), $"o_orderkey" % 100 === 3))
      time("read back count")(
        wh.read(TableRef("s", "f", "t1")).count())
      slice.unpersist()
    }
    spark.stop()
  }
}
