package graft.gold

import org.apache.spark.sql.SparkSession

import graft.catalog.{TableRef, Warehouse}
import graft.sql.Transform

/** Gold-layer materialized views (SURVEY.md §2.2 K5). The reference
  * declares `CREATE MATERIALIZED VIEW gold.brapi.prices AS SELECT ...`
  * via Databricks DLT (/root/reference/Pipelines/Test/transformations/
  * test.sql:1-15); the OSS equivalent is CTAS into the warehouse,
  * refreshed by the job runner on each run. The view body may reference
  * warehouse tables by three-part name and use QUALIFY — it goes through
  * the same Transform pipeline as silver queries.
  */
object Views {

  /** Strip a leading `CREATE [OR REPLACE] MATERIALIZED VIEW x AS`
    * header if present, so reference-shaped view files run verbatim.
    */
  private[gold] def bodyOf(sql: String): String = {
    val p = java.util.regex.Pattern.compile(
      """^\s*CREATE\s+(OR\s+REPLACE\s+)?(MATERIALIZED\s+)?VIEW\s+\S+\s+AS\s+""",
      java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.DOTALL)
    val m = p.matcher(sql)
    if (m.find() && m.start() == 0) sql.substring(m.end()) else sql
  }

  /** Materialize (create-or-refresh) a gold view into the warehouse. */
  def materialize(spark: SparkSession, warehouse: Warehouse, ref: TableRef,
                  viewSql: String): Unit = {
    val tables = warehouse.listTables().map { t =>
      t.toString -> warehouse.registerView(t)
    }.toMap
    warehouse.overwrite(ref, Transform.sql(spark, bodyOf(viewSql), tables))
  }
}
