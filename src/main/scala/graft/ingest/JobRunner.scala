package graft.ingest

import org.apache.spark.sql.SparkSession

import graft.catalog.{TableRef, Warehouse}
import graft.meta.{JobRegistry, TableSpec}
import graft.util.RunLog

/** The reference's job fan-out (/root/reference/bronze/job.ipynb +
  * lib/utils.py:11-24): look up a job by (type, name) in the registry and
  * run one ingestion per table. The reference crosses a process boundary
  * per table (`dbutils.notebook.run`); here it is a plain loop in one
  * JVM — per-table failures are collected so one bad table doesn't stop
  * the job (the isolation the notebook boundary provided), then rethrown
  * together.
  */
final class JobRunner(spark: SparkSession, warehouse: Warehouse,
                      registry: JobRegistry, rawRoot: String, metadataRoot: String) {

  private def specFor(t: TableSpec): IngestSpec = IngestSpec(
    ref = TableRef(t.catalog, t.schema, t.tableName),
    inputFormat = t.inputFormat,
    rawRoot = rawRoot,
    // metadata lives beside the job file, one dir per table, keyed by
    // catalog (bronze/..., silver/... in the reference repo layout)
    metadataDir = s"$metadataRoot/${t.catalog}")

  /** Run a job; `jobType` selects full overwrite vs CDC merge
    * (bronze/job_metadata.yml:1-28 `type: full|cdc`). Every table emits
    * a machine-readable run record (table, rows, duration, outcome) to
    * `<warehouse>/_logs/` — the JSON-lines twin of the reference's
    * per-module JSON log files (lib/logging_utils.py), where the logs
    * double as the run's test record.
    */
  def run(jobType: String, jobName: String): Unit = {
    val job = registry.find(jobType, jobName)
    val log = new RunLog(spark, s"${warehouse.root}/_logs", "ingest")
    try {
      val t0 = System.nanoTime()
      val failures = job.tables.flatMap { t =>
        val ingestor = job.jobType match {
          case "cdc" => new IngestorCDC(spark, warehouse, specFor(t))
          case _ => new Ingestor(spark, warehouse, specFor(t))
        }
        val name = s"${t.catalog}.${t.schema}.${t.tableName}"
        val s0 = System.nanoTime()
        try {
          val rows = ingestor.run()
          log.info("table ingested", "event" -> "table_done",
            "job" -> s"$jobType/$jobName", "table" -> name, "rows" -> rows,
            "duration_sec" -> (System.nanoTime() - s0) / 1e9, "outcome" -> "ok")
          None
        } catch {
          case e: Exception =>
            log.error("table failed", "event" -> "table_failed",
              "job" -> s"$jobType/$jobName", "table" -> name,
              "duration_sec" -> (System.nanoTime() - s0) / 1e9,
              "outcome" -> "failed", "error" -> e.toString)
            Some(s"$name: $e")
        }
      }
      log.write(if (failures.isEmpty) "INFO" else "ERROR", "job finished",
        "event" -> "job_done", "job" -> s"$jobType/$jobName",
        "tables" -> job.tables.size, "failed" -> failures.size,
        "duration_sec" -> (System.nanoTime() - t0) / 1e9,
        "outcome" -> (if (failures.isEmpty) "ok" else "failed"))
      if (failures.nonEmpty)
        throw new RuntimeException(
          s"job $jobType/$jobName: ${failures.size}/${job.tables.size} tables failed:\n" +
            failures.mkString("\n"))
    } finally log.close()
  }
}
