package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints `explain("formatted")` for selected (or
  * all) SparkEntry queries so pushdown/broadcast/codegen shape is
  * reviewable without the Spark UI. Usage:
  * `runMain graft.Explain <sfDir> [queryName ...]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // checkpoint-barrier operators print their internal stage plans too
    spark.conf.set("spark.graft.explainStages", "true")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
