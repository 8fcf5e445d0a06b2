package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec

class GraftCatalogSpec extends SparkSpec {

  /** Distinct parquet files the executed DSv2 scan actually planned. */
  private def plannedFiles(df: DataFrame): Set[String] = {
    df.collect() // force planning through the executed plan
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "no DSv2 BatchScanExec in the plan")
    scans.flatMap(_.partitions.flatten).flatMap {
      case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
      case _                 => Seq.empty
    }.toSet
  }

  test("SQL over the catalog: current snapshot, manifest range pruning, read-only") {
    import spark.implicits._
    val root = tmpDir("wh-sqlcat")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "facts")
    // range-clustered + stats: a tight WHERE must plan a strict subset
    wh.overwrite(ref, (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(8, $"k"), statsColumns = Seq("k"))
    val total = wh.dataFiles(ref).size
    assert(total === 8)

    spark.conf.set("spark.sql.catalog.graftsql", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftsql.root", root)

    // values flow through stock parquet scan + pushdown (no ORDER BY:
    // an exchange would wrap the scan in AQE query stages and hide it
    // from the plannedFiles walk — sort client-side instead)
    val q = spark.sql(
      "SELECT k, v FROM graftsql.silver.g.facts WHERE k BETWEEN 100 AND 120")
    assert(q.as[(Long, String)].collect().toSeq.sortBy(_._1) ===
      (100L to 120L).map(i => (i, s"v$i")))
    // ...and the stats manifest pruned files BEFORE task scheduling
    assert(plannedFiles(q).size < total,
      s"range pushdown never pruned: ${plannedFiles(q).size}/$total files")
    // one-sided bound prunes too (splitFilesByBounds path)
    assert(plannedFiles(spark.sql(
      "SELECT k FROM graftsql.silver.g.facts WHERE k > 900")).size < total)
    // unfiltered read sees every row
    assert(spark.sql("SELECT count(*) AS n FROM graftsql.silver.g.facts")
      .head().getLong(0) === 1000L)

    // SNAPSHOT SEMANTICS: SQL resolves the committed version — after a
    // delete commits, a fresh query sees the new version
    val preDeleteMs = System.currentTimeMillis()
    Thread.sleep(50) // separate the v1/v2 commit-file mtimes
    wh.deleteWhere(ref, $"k" <= 500L)
    assert(spark.sql("SELECT count(*) AS n FROM graftsql.silver.g.facts")
      .head().getLong(0) === 500L)
    // ...and VERSION AS OF time-travels to the pre-delete commit
    assert(spark.sql(
        "SELECT count(*) AS n FROM graftsql.silver.g.facts VERSION AS OF 1")
      .head().getLong(0) === 1000L)
    val tt = intercept[IllegalArgumentException](spark.sql(
      "SELECT * FROM graftsql.silver.g.facts VERSION AS OF 'abc'").collect())
    assert(tt.getMessage.contains("numeric commit version"))
    // TIMESTAMP AS OF resolves via commit-file mtimes (the Delta
    // default clock): a pre-delete timestamp reads v1
    assert(wh.versionAsOf(ref, preDeleteMs) === 1L)
    assert(wh.versionAsOf(ref, System.currentTimeMillis()) === 2L)
    intercept[IllegalArgumentException](wh.versionAsOf(ref, 1000L))
    val preDeleteSql = java.time.LocalDateTime
      .ofInstant(java.time.Instant.ofEpochMilli(preDeleteMs),
        java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
        s"""SELECT count(*) AS n FROM graftsql.silver.g.facts
           |TIMESTAMP AS OF '$preDeleteSql'""".stripMargin)
      .head().getLong(0) === 1000L)

    // read-only: INSERT fails (no SupportsWrite), DDL throws loudly
    intercept[Exception](
      spark.sql("INSERT INTO graftsql.silver.g.facts VALUES (9999, 'x')"))
    val e = intercept[UnsupportedOperationException](
      spark.sql("DROP TABLE graftsql.silver.g.facts"))
    assert(e.getMessage.contains("read-only"))
    // unknown table resolves to the standard analysis error
    intercept[Exception](spark.sql("SELECT * FROM graftsql.silver.g.nope"))

    // LOGLESS dir (e.g. a bucketed saveAsTable output): listed tables
    // must also be loadable — the catalog synthesizes a snapshot from
    // the physical listing, like Warehouse.read's fallback
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(s"$root/silver/g/logless")
    assert(spark.sql("SELECT count(*) AS n FROM graftsql.silver.g.logless")
      .head().getLong(0) === 2L)

    // discovery: SHOW NAMESPACES / SHOW TABLES walk the warehouse layout
    assert(spark.sql("SHOW NAMESPACES IN graftsql")
      .collect().map(_.getString(0)).toSet === Set("silver"))
    assert(spark.sql("SHOW NAMESPACES IN graftsql.silver")
      .collect().map(_.getString(0)).toSet === Set("silver.g"))
    assert(spark.sql("SHOW TABLES IN graftsql.silver.g")
      .collect().map(_.getString(1)).toSet === Set("facts", "logless"))
  }

  test("SQL equality lookups engage bloom skipping where range stats keep everything") {
    import spark.implicits._
    val root = tmpDir("wh-sqlcat-bloom")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "keyed")
    // hash layout on a different column: every file's [min,max] over
    // `id` spans nearly the full range — only blooms can prune
    wh.overwrite(ref, (1L to 1000L).map(i => (i, i % 97, s"v$i")).toDF("id", "grp", "v")
        .repartition(8, $"grp"),
      statsColumns = Seq("id"), bloomColumns = Seq("id"))
    val total = wh.dataFiles(ref).size

    spark.conf.set("spark.sql.catalog.graftsql2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftsql2.root", root)

    val q = spark.sql(
      "SELECT v FROM graftsql2.silver.g.keyed WHERE id = 443")
    assert(q.as[String].collect().toSeq === Seq("v443"))
    assert(plannedFiles(q).size < total,
      s"bloom pushdown never pruned: ${plannedFiles(q).size}/$total files")
  }
}
