package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** JSON-lines run-record writer — the machine-readable run log the
  * reference gets from its JSON log formatter
  * (/root/reference/lib/logging_utils.py:8-18: timestamp / level /
  * message / logger per record; there the logs double as the test
  * record of each ingestion run). Same base shape here, extended with
  * typed run fields (table, rows, duration_sec, outcome, ...), written
  * as one file per run under the warehouse's `_logs/` directory —
  * local filesystems don't support append, and per-run files keep
  * concurrent runs race-free. The underscore prefix keeps Spark's
  * parquet listings from ever picking the records up as data.
  */
final class RunLog(spark: SparkSession, dir: String, logger: String)
    extends AutoCloseable {

  private val file = new Path(dir,
    s"$logger-${System.currentTimeMillis()}-${System.nanoTime().toHexString}.jsonl")
  private val filesystem =
    file.getFileSystem(spark.sparkContext.hadoopConfiguration)
  filesystem.mkdirs(file.getParent)
  private val out = filesystem.create(file, false)

  def path: String = file.toString

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private def jval(v: Any): String = v match {
    case null => "null"
    case n: Long => n.toString
    case n: Int => n.toString
    case b: Boolean => b.toString
    // Locale.ROOT: same comma-decimal hazard as the bench JSON line
    case d: Double => "%.6f".formatLocal(java.util.Locale.ROOT, d)
    case s => "\"" + esc(s.toString) + "\""
  }

  /** Append one record; flushed immediately so a crashed run still
    * leaves every completed table's record on disk.
    */
  def write(level: String, message: String, fields: (String, Any)*): Unit =
    synchronized {
      val base = Seq[(String, Any)](
        "timestamp" -> java.time.Instant.now().toString,
        "level" -> level,
        "message" -> message,
        "logger" -> logger)
      val line = (base ++ fields)
        .map { case (k, v) => "\"" + esc(k) + "\":" + jval(v) }
        .mkString("{", ",", "}")
      out.write((line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.hflush()
    }

  def info(message: String, fields: (String, Any)*): Unit =
    write("INFO", message, fields: _*)
  def error(message: String, fields: (String, Any)*): Unit =
    write("ERROR", message, fields: _*)

  override def close(): Unit = out.close()
}
