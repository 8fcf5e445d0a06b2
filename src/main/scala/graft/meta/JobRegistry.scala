package graft.meta

/** One table entry of a job (job_metadata.yml shape,
  * /root/reference/bronze/job_metadata.yml:1-28).
  */
final case class TableSpec(
    tableName: String,
    inputFormat: String,
    catalog: String,
    schema: String)

/** A named job: `full` (overwrite load) or `cdc` (merge upsert). */
final case class JobSpec(name: String, jobType: String, tables: Seq[TableSpec])

/** The job registry — mirrors lib/utils.py:2-24 (`open_metadata` +
  * `find_job`), with loud errors instead of silent None.
  */
final case class JobRegistry(jobs: Seq[JobSpec]) {

  /** find_job semantics (lib/utils.py:11-24): match on BOTH type and name. */
  def find(jobType: String, jobName: String): JobSpec =
    jobs.find(j => j.jobType == jobType && j.name == jobName).getOrElse(
      throw new NoSuchElementException(
        s"no job with type='$jobType' name='$jobName' " +
          s"(available: ${jobs.map(j => s"${j.jobType}/${j.name}").mkString(", ")})"))
}

object JobRegistry {

  def fromYamlFile(path: String): JobRegistry = fromYaml(Yaml.parseFile(path))

  def fromYamlString(text: String): JobRegistry = fromYaml(Yaml.parse(text))

  def fromYaml(root: Yaml.Value): JobRegistry = {
    val jobs = root.list("jobs").map { j =>
      JobSpec(
        name = j.str("name").getOrElse(""),
        jobType = j.str("type").getOrElse(""),
        tables = j.list("tables").map { t =>
          TableSpec(
            tableName = t.str("table_name").getOrElse(""),
            inputFormat = t.str("input_format").getOrElse(""),
            catalog = t.str("catalog").getOrElse(""),
            schema = t.str("schema").getOrElse(""))
        })
    }
    JobRegistry(jobs)
  }
}
