package graft.ingest

import org.apache.spark.sql.SparkSession

import graft.catalog.{TableRef, Warehouse}
import graft.meta.{JobRegistry, TableSpec}

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
    * (bronze/job_metadata.yml:1-28 `type: full|cdc`).
    */
  def run(jobType: String, jobName: String): Unit = {
    val job = registry.find(jobType, jobName)
    val failures = job.tables.flatMap { t =>
      val ingestor = job.jobType match {
        case "cdc" => new IngestorCDC(spark, warehouse, specFor(t))
        case _ => new Ingestor(spark, warehouse, specFor(t))
      }
      try { ingestor.run(); None }
      catch { case e: Exception => Some(s"${t.catalog}.${t.schema}.${t.tableName}: $e") }
    }
    if (failures.nonEmpty)
      throw new RuntimeException(
        s"job $jobType/$jobName: ${failures.size}/${job.tables.size} tables failed:\n" +
          failures.mkString("\n"))
  }
}
