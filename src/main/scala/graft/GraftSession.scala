package graft

import org.apache.spark.sql.SparkSession

/** Single place the harness sessions (Bench/Verify/Explain, specs) are
  * configured. Notably `spark.sql.legacy.parquet.nanosAsLong` is set
  * HERE, at construction — events.ts is parquet TIMESTAMP(NANOS), which
  * Spark only reads with this flag, and flipping it mid-session inside a
  * loader would silently change nanos handling for every later read.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        "graft.functions.GraftExtensions,graft.plans.GraftOptimizations")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: String): SparkSession = {
    val s = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
