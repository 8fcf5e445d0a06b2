package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.catalog.{TableRef, Warehouse}
import graft.meta.TableMeta
import graft.quality.{CheckTarget, Checker, CheckerHandler}
import graft.queries.QualityQueries

/** Dev-only phase profiler for the checker lifecycle (test sourceset —
  * never ships in the library jar). Run with
  * `Test/runMain graft.DevProfile <sfDir>`.
  */
object DevProfile {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val base = Files.createTempDirectory("graft-profile").toString
    val wh = new Warehouse(spark, s"$base/warehouse")
    val meta = TableMeta.fromYamlString(QualityQueries.scorecardYaml)
    val orders = time("load orders")(Tables.load(spark, sfDir, "orders"))
    val handler = new CheckerHandler(spark, wh,
      Seq(CheckTarget("silver", "orders", orders, meta)), LocalDate.now())

    val annotated = time("compileResults (plan)")(handler.compileResults())
    time("annotate count")(annotated.count())
    time("saveChecks (write)")(handler.saveChecks(annotated))
    val agg = time("aggregateResults (plan)")(handler.aggregateResults())
    time("aggregate collect")(agg.collect())
    time("upsertAggregated")(handler.upsertAggregated(agg))
    time("read final")(
      wh.read(TableRef("silver", "checks", "aggregated_checks")).count())

    // second run: warm-path cost without first-touch overheads
    val handler2 = new CheckerHandler(spark, wh,
      Seq(CheckTarget("silver", "orders", orders, meta)), LocalDate.now())
    time("full execute (2nd run)")(handler2.execute())

    val typed = annotated
      .withColumn("run_date", org.apache.spark.sql.functions.col("run_date").cast("date"))
    time("annotate count (warm)")(typed.count())
    // single-pass vs reference-shape union (N scans) comparison
    val checker = new graft.quality.Checker(orders, meta, LocalDate.now())
    time("annotate single-pass (warm)")(checker.annotateSinglePass().count())
    time("annotate union mode (warm)")(checker.annotate().count())
    time("write partitioned (warm)")(
      typed.write.mode("overwrite").partitionBy("run_date").parquet(s"$base/wp"))
    time("write unpartitioned (warm)")(
      typed.write.mode("overwrite").parquet(s"$base/wu"))
    time("write static-partition dir (warm)")(
      typed.drop("run_date").write.mode("overwrite")
        .parquet(s"$base/ws/run_date=${LocalDate.now()}"))
    spark.stop()
  }
}
