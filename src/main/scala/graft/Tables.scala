package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md):
  * one parquet file per table under a scale-factor directory.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped in several physical shapes across testdata
    * generations: parquet TIMESTAMP(NANOS) — which arrives as a
    * nanosecond long under the session's
    * spark.sql.legacy.parquet.nanosAsLong=true (GraftSession) — and
    * TIMESTAMP(MICROS) without timezone, which Spark reads as
    * TIMESTAMP_NTZ. Normalize either to one logical TimestampType
    * column. The session timezone is pinned to UTC (GraftSession), so
    * the NTZ cast is epoch-preserving — the same instant DuckDB's
    * epoch_us(ts) computes; the nanos data is microsecond-granular
    * (verified), so that truncation is lossless too.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", df.col("ts").cast(TimestampType))
      case _                => df
    }

  /** embeddings.embedding is array<float> in every generation so far,
    * and the similarity stack (typed Array[Float] Datasets, the native
    * DotProduct expression) is written against that. If a future
    * testdata generation ships array<double>, cast it down instead of
    * failing analysis in eight gates — same probe-and-normalize
    * treatment events.ts got after the NANOS→MICROS regen.
    */
  private def normalizeEmbedding(df: DataFrame): DataFrame =
    df.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) => df
      case _ =>
        df.withColumn("embedding", df.col("embedding").cast("array<float>"))
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else if (name == "embeddings") {
      normalizeEmbedding(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** File-source stream over events.parquet with the same ts
    * normalization as `load`. A streaming source requires a declared
    * schema, so probe the parquet footer with a batch read (metadata
    * only — no data scan) and declare exactly what is on disk.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val physical = spark.read.parquet(s"$sfDir/events.parquet").schema
    normalizeEventTs(
      spark.readStream
        .schema(physical)
        // the file source wants a directory; glob down to the one table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
