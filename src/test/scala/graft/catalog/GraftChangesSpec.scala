package graft.catalog

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The change-data-feed surface ([[GraftChangesTable]] — the
  * `.changes` metadata table): write-time change files from
  * merge/delete/update under the `graft.cdf` property, join-free
  * derivations for appends/retirements/replaces, maintenance silence,
  * loud refusal for rewrites the feed cannot render, batch + stream.
  */
class GraftChangesSpec extends SparkSpec {

  private def registerCatalog(name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
  }

  private def feedRows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long)] = {
    import org.apache.spark.sql.functions.col
    df.select(col("k"), col("v"), col(Warehouse.ChangeTypeCol),
        col(Warehouse.CommitVersionCol))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
  }

  test("batch .changes: lifecycle of insert, merge update, delete, compact, overwrite") {
    import spark.implicits._
    val root = tmpDir("wh-cdf")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed")
    wh.overwrite(ref, (1L to 6L).map(i => (i, s"a$i")).toDF("k", "v")
      .repartitionByRange(2, $"k"), statsColumns = Seq("k"))          // v1
    wh.setChangeDataFeed(ref, enabled = true)                         // v2 (meta: no rows)
    assert(wh.cdfEnabled(ref))
    val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsert(Seq((2L, "b2")).toDF("k", "v"))                         // v3: update
    mt.upsert(Seq((5L, "b5"), (7L, "b7")).toDF("k", "v"))             // v4: update + insert
    assert(wh.deleteWhere(ref, $"k" === 5L) === 1L)                   // v5: delete
    wh.compact(ref, smallFileBytes = 1L << 30)                        // v6: maintenance (maybe no-op)
    registerCatalog("graftcdf1", root)

    val got = feedRows(spark.sql("SELECT * FROM graftcdf1.silver.g.fed.changes"))
    val expected = (1L to 6L).map(i => (i, s"a$i", "insert", 1L)).toSet ++ Set(
      (2L, "a2", "update_preimage", 3L), (2L, "b2", "update_postimage", 3L),
      (5L, "a5", "update_preimage", 4L), (5L, "b5", "update_postimage", 4L),
      (7L, "b7", "insert", 4L),
      (5L, "b5", "delete", 5L))
    assert(got === expected)

    // version-scoped batch reads
    assert(feedRows(spark.read.option("startingVersion", "4")
        .option("endingVersion", "4").table("graftcdf1.silver.g.fed.changes"))
      === expected.filter(_._4 == 4L))

    // column pruning reaches the feed's parquet scans: a two-column
    // projection reads two base columns, not the table's width
    val pruned = spark.sql(
      "SELECT k, _commit_version FROM graftcdf1.silver.g.fed.changes")
    pruned.collect()
    val scanSchemas = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema().fieldNames.toSeq
    }
    assert(scanSchemas.nonEmpty && scanSchemas.forall(_ ===
      Seq("k", Warehouse.ChangeTypeCol, Warehouse.CommitVersionCol)),
      s"feed scan must prune to the required base columns: $scanSchemas")

    // timestamp-scoped batch reads resolve on the durable commit clock
    // (graft.ts): [v3's instant, v4's instant] covers exactly v3..v4
    val ts3 = wh.commitMeta(ref, 3L)(Warehouse.TsMeta).toLong
    val ts4 = wh.commitMeta(ref, 4L)(Warehouse.TsMeta).toLong
    assert(feedRows(spark.read
        .option("startingTimestamp", ts3.toString)
        .option("endingTimestamp", ts4.toString)
        .table("graftcdf1.silver.g.fed.changes"))
      === expected.filter(r => r._4 == 3L || r._4 == 4L))

    // the commits that wrote change files carry the marker; derived
    // ones do not
    assert(wh.commitMeta(ref, 3L).get(Warehouse.CdcMeta).contains("1"))
    assert(!wh.commitMeta(ref, 1L).contains(Warehouse.CdcMeta))

    // a full overwrite derives as delete-all + insert-all
    val vBefore = wh.currentVersion(ref).get
    wh.overwrite(ref, Seq((100L, "z")).toDF("k", "v"))
    val after = feedRows(spark.read
      .option("startingVersion", (vBefore + 1).toString)
      .table("graftcdf1.silver.g.fed.changes"))
    val survivors = Set((1L, "a1"), (2L, "b2"), (3L, "a3"), (4L, "a4"),
      (6L, "a6"), (7L, "b7"))
    assert(after === survivors.map { case (k, v) =>
      (k, v, "delete", vBefore + 1) } + ((100L, "z", "insert", vBefore + 1)))
  }

  test("updateWhere emits pre/post images; truncate derives deletes") {
    import spark.implicits._
    val root = tmpDir("wh-cdf-upd")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed_upd")
    wh.overwrite(ref, (1L to 4L).map(i => (i, s"a$i")).toDF("k", "v"))  // v1
    wh.setChangeDataFeed(ref, enabled = true)                           // v2
    assert(wh.updateWhere(ref, $"k" <= 2L,
      Seq("v" -> org.apache.spark.sql.functions.concat_ws("",
        $"v", org.apache.spark.sql.functions.lit("!")))) === 2L)        // v3
    registerCatalog("graftcdf2", root)
    val got = feedRows(spark.read.option("startingVersion", "3")
      .table("graftcdf2.silver.g.fed_upd.changes"))
    assert(got === Set(
      (1L, "a1", "update_preimage", 3L), (1L, "a1!", "update_postimage", 3L),
      (2L, "a2", "update_preimage", 3L), (2L, "a2!", "update_postimage", 3L)))

    wh.truncate(ref)                                                    // v4: full replace, zero adds
    val got4 = feedRows(spark.read.option("startingVersion", "4")
      .table("graftcdf2.silver.g.fed_upd.changes"))
    assert(got4 === Set((1L, "a1!", "delete", 4L), (2L, "a2!", "delete", 4L),
      (3L, "a3", "delete", 4L), (4L, "a4", "delete", 4L)))
  }

  test("a partial rewrite without change files refuses loudly; later ranges still read") {
    import spark.implicits._
    val root = tmpDir("wh-cdf-off")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed_off")
    // CDF OFF: a straddling delete produces a partial rewrite commit
    // the feed cannot render row-exactly
    wh.overwrite(ref, (1L to 20L).map(i => (i, s"a$i")).toDF("k", "v")
      .repartitionByRange(4, $"k"), statsColumns = Seq("k"))           // v1
    assert(wh.deleteWhere(ref, $"k" === 1L) === 1L)                    // v2: partial rewrite, no cdc
    val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsert((21L to 23L).map(i => (i, s"a$i")).toDF("k", "v"))       // v3: pure insert
    registerCatalog("graftcdf3", root)
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graftcdf3.silver.g.fed_off.changes").collect()
    }
    def rootMessage(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && (c.getCause ne c)) c = c.getCause
      Option(c.getMessage).getOrElse(t.getMessage)
    }
    assert(rootMessage(err).contains("setChangeDataFeed"),
      s"expected the enable-CDF hint, got: ${rootMessage(err)}")
    // the readable suffix still answers
    assert(feedRows(spark.read.option("startingVersion", "3")
        .table("graftcdf3.silver.g.fed_off.changes"))
      === (21L to 23L).map(i => (i, s"a$i", "insert", 3L)).toSet)
  }

  test("streaming .changes: drain, restart emits only new commits") {
    import spark.implicits._
    val root = tmpDir("wh-cdf-stream")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed_str")
    wh.overwrite(ref, (1L to 4L).map(i => (i, s"a$i")).toDF("k", "v")
      .repartitionByRange(2, $"k"), statsColumns = Seq("k"))           // v1
    wh.setChangeDataFeed(ref, enabled = true)                          // v2
    val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsert(Seq((2L, "b2")).toDF("k", "v"))                          // v3
    registerCatalog("graftcdf4", root)

    val ckpt = tmpDir("cdf-stream-ckpt")
    val out = tmpDir("cdf-stream-out")
    def drain(): Unit =
      spark.readStream.table("graftcdf4.silver.g.fed_str.changes")
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    drain()
    assert(feedRows(spark.read.parquet(out)) ===
      (1L to 4L).map(i => (i, s"a$i", "insert", 1L)).toSet ++ Set(
        (2L, "a2", "update_preimage", 3L), (2L, "b2", "update_postimage", 3L)))

    assert(wh.deleteWhere(ref, $"k" === 4L) === 1L)                    // v4
    drain()
    assert(feedRows(spark.read.parquet(out)).count(_._4 == 4L) === 1)
    assert(feedRows(spark.read.parquet(out)).filter(_._4 == 4L)
      === Set((4L, "a4", "delete", 4L)))
    drain() // nothing new
    assert(spark.read.parquet(out).count() === 7L)
  }

  test(".changes straddles schema evolution: null-backfill, dropped columns vanish, streaming exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DoubleType, StructField}
    val root = tmpDir("wh-cdf-evo")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed_evo")
    wh.overwrite(ref, (1L to 3L).map(i => (i, s"a$i")).toDF("k", "v"),
      statsColumns = Seq("k"))                                         // v1
    wh.setChangeDataFeed(ref, enabled = true)                          // v2
    val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsert(Seq((2L, "b2")).toDF("k", "v"))                          // v3: pre-evolution change files
    registerCatalog("graftcdfe", root)

    val ckpt = tmpDir("cdf-evo-ckpt")
    val out = tmpDir("cdf-evo-out")
    def drain(): Unit =
      spark.readStream.table("graftcdfe.silver.g.fed_evo.changes")
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    def sink() = spark.read.option("mergeSchema", "true").parquet(out)
    drain() // consumes v1..v3 (the pre-evolution shape)
    assert(sink().count() === 5L) // 3 base inserts + one update pair

    wh.addColumns(ref, Seq(StructField("score", DoubleType)))          // v4: meta-only
    new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None,
      evolveSchema = true)
      .upsert(Seq((3L, "c3", 1.5)).toDF("k", "v", "score"))            // v5: post-widening pair

    // BATCH read through the widened schema: old change files
    // null-backfill `score` by name; the post-widening pair carries it
    val widened = spark.sql("SELECT * FROM graftcdfe.silver.g.fed_evo.changes")
    assert(widened.columns.contains("score"))
    assert(widened.filter(col(Warehouse.CommitVersionCol) <= 3L &&
      col("score").isNotNull).count() === 0L, "pre-widening rows must null-backfill")
    assert(widened.filter(col(Warehouse.CommitVersionCol) === 5L &&
        col(Warehouse.ChangeTypeCol) === "update_postimage")
      .select("score").as[Double].collect().toSeq === Seq(1.5))

    // STREAMING restart ACROSS the evolution commit: exactly-once —
    // v3's pair is not re-emitted, the meta-only v4 contributes zero
    // rows, v5's pair arrives once
    drain()
    val afterWiden = sink()
    assert(afterWiden.filter(col(Warehouse.CommitVersionCol) === 3L).count() === 2L)
    assert(afterWiden.filter(col(Warehouse.CommitVersionCol) === 4L).count() === 0L)
    assert(afterWiden.filter(col(Warehouse.CommitVersionCol) === 5L).count() === 2L)

    wh.dropColumns(ref, Seq("v"))                                      // v6: meta-only narrow
    // dropped columns VANISH from the feed (the current snapshot schema
    // renders every version); the files still physically carry the bytes
    val narrowed = spark.sql("SELECT * FROM graftcdfe.silver.g.fed_evo.changes")
    assert(!narrowed.columns.contains("v"))
    assert(narrowed.count() === widened.count(), "same rows, narrower shape")

    // one more write in the narrowed shape, then a restart across the
    // DROP commit: still exactly-once, v6 silent, v7's pair lands once
    new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
      .upsert(Seq((1L, 9.9)).toDF("k", "score"))                       // v7
    drain()
    val end = sink()
    assert(end.filter(col(Warehouse.CommitVersionCol) === 6L).count() === 0L)
    assert(end.filter(col(Warehouse.CommitVersionCol) === 7L).count() === 2L)
    assert(end.filter(col(Warehouse.CommitVersionCol) === 3L).count() === 2L,
      "restarts must never re-emit consumed commits")
  }

  test("the feed refuses vacuumed ranges loudly; surviving ranges answer") {
    import spark.implicits._
    val root = tmpDir("wh-cdf-vac")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed_vac")
    wh.overwrite(ref, (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v"),
      statsColumns = Seq("k"))                                         // v1
    val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsert((11L to 15L).map(i => (i, s"a$i")).toDF("k", "v"))       // v2
    mt.upsert((16L to 20L).map(i => (i, s"a$i")).toDF("k", "v"))       // v3
    wh.vacuum(ref, keepVersions = 2)                                   // horizon = v2
    registerCatalog("graftcdfv", root)
    // an explicit start below retention fails loudly
    val err = intercept[Exception] {
      spark.read.option("startingVersion", "1")
        .table("graftcdfv.silver.g.fed_vac.changes").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
        .flatMap(c => Option(c.getMessage))
    assert(chain(err).exists(_.contains("vacuum retention")))
    // the default batch read covers exactly the surviving range
    assert(feedRows(spark.sql(
        "SELECT * FROM graftcdfv.silver.g.fed_vac.changes"))
      === (11L to 20L).map(i =>
        (i, s"a$i", "insert", if (i <= 15) 2L else 3L)).toSet)
  }

  test("maxFilesPerTrigger paces the feed: whole commits per batch, full result") {
    import spark.implicits._
    val root = tmpDir("wh-cdf-rate")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed_rate")
    wh.overwrite(ref, (1L to 40L).map(i => (i, s"a$i")).toDF("k", "v")
      .repartitionByRange(2, $"k"), statsColumns = Seq("k"))           // v1: 2 files
    val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsert((41L to 60L).map(i => (i, s"a$i")).toDF("k", "v"))       // v2: inserts
    mt.upsert((61L to 80L).map(i => (i, s"a$i")).toDF("k", "v"))       // v3: inserts
    registerCatalog("graftcdf7", root)
    val ckpt = tmpDir("cdf-rate-ckpt")
    val out = tmpDir("cdf-rate-out")
    val q = spark.readStream
      .option("maxFilesPerTrigger", "2")
      .table("graftcdf7.silver.g.fed_rate.changes")
      .writeStream
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3,
      s"a 2-file budget over 3 commits must take >= 3 batches, took $batches")
    assert(feedRows(spark.read.parquet(out))
      === (1L to 80L).map(i => (i, s"a$i", "insert",
        if (i <= 40) 1L else if (i <= 60) 2L else 3L)).toSet)
  }

  test(".history and .files metadata tables answer from the log and manifest") {
    import spark.implicits._
    val root = tmpDir("wh-meta-tables")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "inspected")
    wh.overwrite(ref, (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, $"k"), statsColumns = Seq("k"))           // v1
    val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsert((101L to 120L).map(i => (i, s"v$i")).toDF("k", "v"))     // v2
    registerCatalog("graftmeta1", root)

    val hist = spark.sql(
      "SELECT version, operation FROM graftmeta1.silver.g.inspected.history")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist === Seq((2L, "MERGE"), (1L, "OVERWRITE")))

    val files = spark.sql(
      "SELECT file, bytes, rows FROM graftmeta1.silver.g.inspected.files")
      .collect()
    assert(files.length === wh.dataFiles(ref).size)
    assert(files.forall(r => r.getLong(1) > 0L),
      "every live file must carry its recorded size")
    assert(files.map(_.getLong(2)).sum === 120L,
      "manifest row counts must sum to the table's row count")
    // the layout-debugging query the surface exists for
    assert(spark.sql(
      """SELECT count(*) AS small FROM graftmeta1.silver.g.inspected.files
        |WHERE bytes < 1048576""".stripMargin).head().getLong(0) > 0L)
  }

  test(".detail metadata table: the one-row DESCRIBE DETAIL summary") {
    import spark.implicits._
    val root = tmpDir("wh-meta-detail")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "detailed")
    wh.overwrite(ref,
      (1L to 50L).map(i => (i, s"g${i % 2}", i * 1.0, i * 100L))
        .toDF("k", "seg", "price", "cents").repartition(2),
      partitionBy = Seq("seg"), statsColumns = Seq("k"))
    wh.setChangeDataFeed(ref, enabled = true)
    wh.setDeletionVectors(ref, enabled = true)
    wh.setCheckConstraint(ref, "pos_price", "price > 0")
    wh.setGeneratedColumn(ref, "cents", "CAST(round(price * 100) AS BIGINT)")
    wh.deleteWhere(ref, $"k" === 3L) // one DV'd file
    registerCatalog("graftmeta2", root)
    val d = spark.sql("SELECT * FROM graftmeta2.silver.g.detailed.detail")
      .collect()
    assert(d.length === 1)
    val r = d.head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getString(byName("name")) === "silver.g.detailed")
    assert(r.getLong(byName("num_files")) ===
      wh.snapshot(ref).get.files.size.toLong)
    assert(r.getLong(byName("size_bytes")) > 0L)
    assert(r.getString(byName("partition_columns")) === "seg")
    assert(r.getString(byName("stats_columns")) === "k")
    assert(r.getLong(byName("num_dv_files")) === 1L)
    assert(r.getLong(byName("num_foreign_files")) === 0L)
    assert(r.getBoolean(byName("cdf_enabled")))
    assert(r.getBoolean(byName("dv_enabled")))
    assert(r.getString(byName("constraints")) === "pos_price")
    assert(r.getString(byName("generated_columns"))
      .startsWith("cents AS ("))
    assert(r.isNullAt(byName("pinned_by")))
    // a shallow clone's detail reports its foreign entries, and the
    // SOURCE's detail reports the pin (compact first: a shallow clone
    // of a live-DV snapshot refuses by contract)
    wh.compact(ref)
    wh.cloneTable(ref, TableRef("dev", "g", "dcl"), shallow = true)
    val cd = spark.sql("SELECT num_foreign_files, pinned_by " +
      "FROM graftmeta2.dev.g.dcl.detail").head()
    assert(cd.getLong(0) > 0L)
    val sd = spark.sql("SELECT pinned_by " +
      "FROM graftmeta2.silver.g.detailed.detail").head()
    assert(sd.getString(0).startsWith("dev.g.dcl@v"))
  }

  test("SHOW TBLPROPERTIES surfaces version, carried meta, and physical design") {
    import spark.implicits._
    val root = tmpDir("wh-tblprops")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "propped")
    wh.overwrite(ref, Seq((1L, "a", "eu"), (2L, "b", "us")).toDF("k", "v", "p"),
      partitionBy = Seq("p"))
    wh.setChangeDataFeed(ref, enabled = true)
    registerCatalog("graftprops", root)
    val props = spark.sql(
      "SHOW TBLPROPERTIES graftprops.silver.g.propped")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.version").contains("2"))
    assert(props.get("graft.cdf").contains("true"))
    assert(props.get("graft.partition_by").contains("p"))
    assert(props.contains("graft.ts"))
  }

  test("SQL-only lifecycle: CALL set_cdf, SQL UPDATE/DELETE, SELECT from .changes") {
    import spark.implicits._
    val root = tmpDir("wh-cdf-sql")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed_sql")
    wh.overwrite(ref, (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v"))  // v1
    registerCatalog("graftcdf6", root)
    val r = spark.sql(
      "CALL graftcdf6.system.set_cdf('silver.g.fed_sql')").head()       // v2
    assert(r.getBoolean(1) === true)
    assert(wh.cdfEnabled(ref))
    spark.sql(
      "UPDATE graftcdf6.silver.g.fed_sql SET v = 'upd' WHERE k = 3")    // v3
    spark.sql("DELETE FROM graftcdf6.silver.g.fed_sql WHERE k = 7")     // v4
    val got = feedRows(spark.sql(
      """SELECT * FROM graftcdf6.silver.g.fed_sql.changes
        |WHERE _commit_version >= 3""".stripMargin))
    assert(got === Set(
      (3L, "a3", "update_preimage", 3L), (3L, "upd", "update_postimage", 3L),
      (7L, "a7", "delete", 4L)))
  }

  test("derived inserts on a partitioned table carry partition values; vacuum sweeps old change files") {
    import spark.implicits._
    val root = tmpDir("wh-cdf-part")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "fed_part")
    wh.overwrite(ref,
      Seq((1L, "a1", "eu"), (2L, "a2", "us")).toDF("k", "v", "region"),
      partitionBy = Seq("region"))                                     // v1
    wh.setChangeDataFeed(ref, enabled = true)                          // v2
    wh.append(ref, Seq((3L, "a3", "eu")).toDF("k", "v", "region"))     // v3
    registerCatalog("graftcdf5", root)
    val got = spark.sql(
      "SELECT k, region, _change_type, _commit_version " +
        "FROM graftcdf5.silver.g.fed_part.changes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got === Set((1L, "eu", "insert", 1L), (2L, "us", "insert", 1L),
      (3L, "eu", "insert", 3L)))

    // change-file hygiene: a cdc-marked commit, then vacuum under a
    // 1-version window sweeps the now-unreadable versions' change dirs
    assert(wh.updateWhere(ref, $"k" === 1L,
      Seq("v" -> org.apache.spark.sql.functions.lit("x"))) === 1L)     // v4 (cdc)
    val cdcDir = wh.cdcPath(ref, 4L)
    val fs = cdcDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(cdcDir))
    wh.overwrite(ref, Seq((9L, "z", "eu")).toDF("k", "v", "region"))   // v5
    wh.vacuum(ref, keepVersions = 1)
    assert(!fs.exists(cdcDir),
      "vacuum must sweep change files of versions below the horizon")
  }
}
