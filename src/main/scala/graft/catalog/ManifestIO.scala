package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Driver-side single-file parquet writer for the tiny per-table stats
  * manifests.
  *
  * A stats manifest holds one row per data file — at commit scale a
  * handful of rows, yet the write path used to produce it through
  * `df.coalesce(1).write.parquet(...)`: a full Spark job (task launch,
  * output committer `_temporary` dance, job commit) per COMMIT, plus a
  * second job when the post-commit [[Warehouse]] cache re-read it.
  * Those two fixed costs (~0.3-0.5 s each locally) multiplied across
  * every stats-bearing commit were the single largest per-commit
  * overhead in the write path.
  *
  * This writer produces the same bytes a Spark executor would — it IS
  * Spark's own [[ParquetWriteSupport]] (the exact WriteSupport the
  * distributed parquet sink uses), driven on the driver through
  * parquet-hadoop's public `ParquetWriter`, with the session's write
  * confs (legacy format, timestamp type, field ids, compression)
  * mirrored the way `ParquetUtils.prepareWrite` does. Read-back is
  * therefore bit-identical in semantics to the executor-written file.
  *
  * Scale posture: callers gate on row count
  * ([[Warehouse.manifestLocalWriteRows]]) — a 100k-file table's
  * manifest keeps the distributed write; only commit-scale manifests
  * (the overwhelmingly common case, and the one where fixed job costs
  * dominate) take the driver path. This mirrors how Delta/Iceberg
  * write their commit metadata from the driver.
  */
private[catalog] object ManifestIO {

  private final class Builder(file: HadoopOutputFile)
      extends ParquetWriter.Builder[InternalRow, Builder](file) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport()
  }

  /** Session write confs the executor parquet sink would see, mirrored
    * onto the hadoop conf `ParquetWriteSupport.init` reads.
    */
  private def writeConf(spark: SparkSession, schema: StructType): Configuration = {
    val conf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, conf)
    def mirror(key: String): Unit = // ConfigEntry default when unset; a
      // key this Spark build doesn't register is skipped rather than
      // failing the commit (spark.conf.get throws on unknown keys)
      spark.conf.getOption(key).foreach(conf.set(key, _))
    mirror("spark.sql.parquet.writeLegacyFormat")
    mirror("spark.sql.parquet.outputTimestampType")
    mirror("spark.sql.parquet.fieldId.write.enabled")
    mirror("spark.sql.parquet.datetimeRebaseModeInWrite")
    mirror("spark.sql.parquet.int96RebaseModeInWrite")
    mirror("spark.sql.parquet.variant.annotateLogicalType.enabled")
    conf
  }

  private def codec(spark: SparkSession): CompressionCodecName = {
    val name = spark.conf.get("spark.sql.parquet.compression.codec")
    try CompressionCodecName.valueOf(name.toUpperCase(java.util.Locale.ROOT))
    catch { case _: IllegalArgumentException => CompressionCodecName.SNAPPY }
  }

  /** Top-level fields marked nullable — what `spark.read.parquet` of
    * the written file reports (parquet scans never claim required
    * top-level fields), so seeded cache frames match read-back frames.
    */
  def relaxedNullability(schema: StructType): StructType =
    StructType(schema.fields.map(_.copy(nullable = true)))

  /** Write `rows` as one parquet file at `dest` (created/overwritten),
    * no Spark job. The file name should end in `.parquet` — manifest
    * readers address part files by that suffix.
    */
  def writeLocalParquet(spark: SparkSession, schema: StructType,
                        rows: Seq[Row], dest: Path): Unit = {
    val conf = writeConf(spark, schema)
    val toInternal = ExpressionEncoder(RowEncoder.encoderFor(schema))
      .createSerializer()
    val writer = new Builder(HadoopOutputFile.fromPath(dest, conf))
      .withConf(conf)
      .withCompressionCodec(codec(spark))
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    try rows.foreach(r => writer.write(toInternal(r)))
    finally writer.close()
  }
}
