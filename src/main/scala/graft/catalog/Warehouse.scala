package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Three-level table reference, mirroring the reference's
  * `catalog.schema.table` namespace (/root/reference/lib/ingestors.py:95,
  * `saveAsTable(f'{catalog}.{schema}.{table_name}')`).
  */
final case class TableRef(catalog: String, schema: String, table: String) {
  require(Seq(catalog, schema, table).forall(p => p.nonEmpty && !p.contains("/")),
    s"illegal table reference: $this")
  override def toString: String = s"$catalog.$schema.$table"
}

object TableRef {
  /** Parse `catalog.schema.table`. */
  def parse(s: String): TableRef = s.split('.') match {
    case Array(c, sc, t) => TableRef(c, sc, t)
    case _ => throw new IllegalArgumentException(
      s"expected catalog.schema.table, got '$s'")
  }
}

/** Path-backed warehouse: each `catalog.schema.table` is a parquet
  * directory `$root/catalog/schema/table`. Replaces the reference's
  * Databricks catalog + Delta storage (SURVEY.md §1.1) — no Delta jar
  * ships in this environment, so table writes are atomic via
  * write-to-temp + rename swap. Single-writer semantics only (documented
  * limitation, SURVEY.md §7.3): concurrent writers to one table race on
  * the rename; concurrent readers of a table being swapped may fail one
  * read and succeed on retry. On a real cluster this would be a
  * transactional format's job (Delta/Iceberg); the engine's operators are
  * storage-agnostic DataFrames either way.
  */
final class Warehouse(spark: SparkSession, val root: String) {

  private val hadoopConf = spark.sparkContext.hadoopConfiguration

  def path(ref: TableRef): String = s"$root/${ref.catalog}/${ref.schema}/${ref.table}"

  private def fs(p: Path) = p.getFileSystem(hadoopConf)

  def exists(ref: TableRef): Boolean = {
    val p = new Path(path(ref))
    fs(p).exists(p)
  }

  def read(ref: TableRef): DataFrame = spark.read.parquet(path(ref))

  /** K1 full overwrite (lib/ingestors.py:92-96), atomic swap:
    * write `<path>.tmp-<nonce>`, rename old out of the way, rename temp
    * in, delete old. A reader holding the old directory's file list can
    * finish its scan; new readers resolve the new directory.
    */
  def overwrite(ref: TableRef, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val target = new Path(path(ref))
    val filesystem = fs(target)
    filesystem.mkdirs(target.getParent)
    val nonce = System.nanoTime().toString
    val tmp = new Path(path(ref) + s".tmp-$nonce")
    val old = new Path(path(ref) + s".old-$nonce")
    val writer = if (partitionBy.isEmpty) df.write else df.write.partitionBy(partitionBy: _*)
    writer.mode("overwrite").parquet(tmp.toString)
    try {
      val hadOld = filesystem.exists(target)
      if (hadOld && !filesystem.rename(target, old))
        throw new RuntimeException(s"failed to stage out old data for $ref")
      try {
        if (!filesystem.rename(tmp, target))
          throw new RuntimeException(s"failed to swap in new data for $ref")
      } catch {
        case e: Throwable =>
          // The table directory must never be left absent: if the swap-in
          // failed after the old data was staged out, roll it back.
          if (hadOld && !filesystem.exists(target)) filesystem.rename(old, target)
          throw e
      }
      filesystem.delete(old, true)
      ()
    } finally {
      filesystem.delete(tmp, true)
      ()
    }
  }

  /** K4 TRUNCATE (lib/checker_handler.py:119): keep the table, drop rows. */
  def truncate(ref: TableRef): Unit =
    if (exists(ref)) overwrite(ref, read(ref).limit(0))

  def drop(ref: TableRef): Unit = {
    val p = new Path(path(ref))
    fs(p).delete(p, true)
    ()
  }

  /** Enumerate all tables as `$root/catalog/schema/table` directories
    * (skipping in-flight `.tmp-`/`.old-` staging dirs).
    */
  def listTables(): Seq[TableRef] = {
    val rootPath = new Path(root)
    val filesystem = fs(rootPath)
    if (!filesystem.exists(rootPath)) return Seq.empty
    def dirs(p: Path) =
      filesystem.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq
    for {
      cat <- dirs(rootPath)
      sch <- dirs(cat)
      tbl <- dirs(sch) if !tbl.getName.contains(".tmp-") && !tbl.getName.contains(".old-")
    } yield TableRef(cat.getName, sch.getName, tbl.getName)
  }

  /** S6-style view registration: `catalog.schema.table` →
    * temp view `catalog_schema_table` (OSS temp views are single-level).
    */
  def registerView(ref: TableRef): String = {
    val name = s"${ref.catalog}_${ref.schema}_${ref.table}"
    read(ref).createOrReplaceTempView(name)
    name
  }
}
