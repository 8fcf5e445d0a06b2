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

  /** Incrementally refresh a latest-per-key materialized view from the
    * base table's change feed instead of a full recompute: only the
    * view partitions whose `viewKeys` appear among rows changed since
    * `sinceVersion` are re-derived (from the base restricted to those
    * partitions — a broadcast semi join, so untouched partitions never
    * scan) and PARTITION-REPLACED into the view
    * ([[graft.sinks.MergeTable.replacePartitions]]). Returns the base
    * version the view now reflects; pass it back as the next
    * `sinceVersion`.
    *
    * Deletes and partition moves are handled by tombstoning, not
    * refused: the feed's `update_pre` and `delete` rows carry
    * before-images, so a changed row marks BOTH its old and new view
    * partition affected; every affected partition is recomputed from
    * the current base, and one left with no base rows simply has no
    * replacement rows — the partition replace empties it instead of
    * leaving a stale latest row.
    *
    * Contract: the view body must be per-`viewKeys`-partition-local
    * (the QUALIFY latest-per-key family — each output row depends only
    * on base rows sharing its partition key).
    */
  def refreshIncremental(spark: SparkSession, warehouse: Warehouse,
                         viewRef: TableRef, baseRef: TableRef,
                         sinceVersion: Long, viewSql: String,
                         viewKeys: Seq[String], baseKeys: Seq[String]): Long = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import graft.util.PhaseTimer.time
    val cur = warehouse.currentVersion(baseRef).getOrElse(
      throw new IllegalArgumentException(s"$baseRef has no committed version"))
    if (cur == sinceVersion) return cur
    // distinct partition keys over EVERY image in the feed (pre + post
    // + delete); materialized once — it feeds the recompute slice, the
    // partition replace, and its pruning bounds
    val affected = time("mvrefresh.feed") {
      warehouse.changeFeed(baseRef, sinceVersion, cur, baseKeys)
        .select(viewKeys.map(col): _*).distinct().localCheckpoint()
    }
    val recomputed = time("mvrefresh.plan") {
      val body = bodyOf(viewSql)
      // register only the tables the body can actually reference (the
      // base is overridden by the slice below) — registerView opens the
      // table, and a warehouse can hold hundreds of them
      def referenced(t: TableRef): Boolean =
        body.contains(t.toString) ||
          body.contains(s"`${t.catalog}`.`${t.schema}`.`${t.table}`")
      val tables = warehouse.listTables()
        .filter(t => t != baseRef && referenced(t)).map { t =>
          t.toString -> warehouse.registerView(t)
        }.toMap
      // the view body reads the base by three-part name — point that name
      // at the affected-partition slice instead of the full table
      val slice = warehouse.read(baseRef)
        .join(broadcast(affected), viewKeys, "left_semi")
      val sliceView = s"__graft_incr_${baseRef.catalog}_${baseRef.schema}_${baseRef.table}"
      slice.createOrReplaceTempView(sliceView)
      Transform.sql(spark, bodyOf(viewSql),
        tables + (baseRef.toString -> sliceView))
    }
    time("mvrefresh.replace") {
      new graft.sinks.MergeTable(spark, warehouse, viewRef, viewKeys, None)
        .replacePartitions(affected, recomputed)
    }
    // the replace is committed — the affected-keys checkpoint is dead;
    // without this every refresh leaked its blocks for the JVM's life
    graft.util.Scratch.release(affected)
    cur
  }
}
