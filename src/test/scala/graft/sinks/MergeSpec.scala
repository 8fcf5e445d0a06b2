package graft.sinks

import java.sql.Timestamp

import graft.SparkSpec
import graft.catalog.{TableRef, Warehouse}

class MergeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("J1 CDC merge: newer wins, unmatched kept, new keys inserted") {
    import spark.implicits._
    val target = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1.0),
      ("B", ts("2024-01-01 00:00:00"), 2.0)).toDF("k", "t", "v")
    val source = Seq(
      ("A", ts("2024-02-01 00:00:00"), 10.0), // newer → update
      ("C", ts("2024-01-15 00:00:00"), 3.0))  // new key → insert
    .toDF("k", "t", "v")
    val out = Merge.merge(target, source, Seq("k"), Some("t"))
      .as[(String, Timestamp, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      ("A", ts("2024-02-01 00:00:00"), 10.0),
      ("B", ts("2024-01-01 00:00:00"), 2.0),
      ("C", ts("2024-01-15 00:00:00"), 3.0)))
  }

  test("J1 stale-row quirk: older source row is INSERTED (Delta edge, SURVEY §2.5)") {
    import spark.implicits._
    val target = Seq(("A", ts("2024-02-01 00:00:00"), 5.0)).toDF("k", "t", "v")
    val source = Seq(("A", ts("2024-01-01 00:00:00"), 4.0)).toDF("k", "t", "v")
    val out = Merge.merge(target, source, Seq("k"), Some("t"))
      .as[(String, Timestamp, Double)].collect().sortBy(_._2).toSeq
    // the stale row fails `new.t >= old.t`, matches nothing → inserted
    assert(out === Seq(
      ("A", ts("2024-01-01 00:00:00"), 4.0),
      ("A", ts("2024-02-01 00:00:00"), 5.0)))
  }

  test("equal timestamps match (>= not >) and update wins") {
    import spark.implicits._
    val t0 = ts("2024-01-01 00:00:00")
    val target = Seq(("A", t0, 1.0)).toDF("k", "t", "v")
    val source = Seq(("A", t0, 9.0)).toDF("k", "t", "v")
    val out = Merge.merge(target, source, Seq("k"), Some("t"))
      .as[(String, Timestamp, Double)].collect().toSeq
    assert(out === Seq(("A", t0, 9.0)))
  }

  test("multiple source rows for one target resolve to latest ts") {
    import spark.implicits._
    val target = Seq(("A", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val source = Seq(
      ("A", ts("2024-03-01 00:00:00"), 30.0),
      ("A", ts("2024-02-01 00:00:00"), 20.0)).toDF("k", "t", "v")
    val out = Merge.merge(target, source, Seq("k"), Some("t"))
      .as[(String, Timestamp, Double)].collect().toSeq
    // latest (March) wins the update; February matched too (>= Jan) so it
    // is NOT an insert — exactly one surviving row
    assert(out === Seq(("A", ts("2024-03-01 00:00:00"), 30.0)))
  }

  test("J2 multi-key equi merge without ts: composite keys, bootstrap via MergeTable") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-merge"))
    val ref = TableRef("silver", "checks", "aggregated_checks")
    val mt = new MergeTable(spark, wh, ref, Seq("test_name", "table_name"), None)

    // first run bootstraps (lib/checker_handler.py:173-177)
    mt.upsert(Seq(("t1", "tab", 0.5), ("t2", "tab", 0.9)).toDF("test_name", "table_name", "total_score"))
    assert(wh.read(ref).count() === 2)

    // second run updates matched, inserts new
    mt.upsert(Seq(("t1", "tab", 0.7), ("t3", "tab", 1.0)).toDF("test_name", "table_name", "total_score"))
    val out = wh.read(ref).as[(String, String, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(("t1", "tab", 0.7), ("t2", "tab", 0.9), ("t3", "tab", 1.0)))
  }

  test("null keys never match: null-key rows on both sides survive independently") {
    import spark.implicits._
    val target = Seq(
      (Option("A"), ts("2024-01-01 00:00:00"), 1.0),
      (Option.empty[String], ts("2024-01-01 00:00:00"), 2.0)).toDF("k", "t", "v")
    val source = Seq(
      (Option("A"), ts("2024-02-01 00:00:00"), 10.0),
      (Option.empty[String], ts("2024-02-01 00:00:00"), 20.0)).toDF("k", "t", "v")
    val out = Merge.merge(target, source, Seq("k"), Some("t"))
      .as[(Option[String], Timestamp, Double)].collect()
      .sortBy(r => (r._1.getOrElse(""), r._3)).toSeq
    // null keys fail the equi condition (SQL = semantics): the target's
    // null-key row is kept AND the source's null-key row inserts
    assert(out.map(_._3) === Seq(2.0, 20.0, 10.0))
  }

  test("empty source and empty target degenerate correctly") {
    import spark.implicits._
    val rows = Seq(("A", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val empty = rows.limit(0)
    assert(Merge.merge(rows, empty, Seq("k"), Some("t"))
      .collect().toSeq === rows.collect().toSeq)
    assert(Merge.merge(empty, rows, Seq("k"), Some("t"))
      .collect().toSeq === rows.collect().toSeq)
  }

  /** (length, mtime) fingerprint — same path + same stamp = untouched. */
  private def stamp(p: String): (Long, Long) = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(path)
    (st.getLen, st.getModificationTime)
  }

  test("incremental upsert rewrites only key-overlapping files; rest byte-identical") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-incr"))
    val ref = TableRef("silver", "cdc", "facts")
    val mt = new MergeTable(spark, wh, ref, Seq("k"), Some("t"))
    val base = (1 to 400).map(i => (i, ts("2024-01-01 00:00:00"), i.toDouble))
      .toDF("k", "t", "v").repartitionByRange(4, $"k")
    mt.upsert(base) // bootstrap: 4 range-clustered files + key stats
    val before = wh.dataFiles(ref)
    assert(before.size === 4)
    val beforeStamps = before.map(p => p -> stamp(p)).toMap

    val batch = Seq(
      (150, ts("2024-02-01 00:00:00"), -150.0), // newer → update
      (160, ts("2023-01-01 00:00:00"), -160.0), // stale → duplicate insert (J1 quirk)
      (170, ts("2024-02-01 00:00:00"), -170.0))
      .toDF("k", "t", "v")
    // reference semantics computed over the FULL pre-merge table
    val expected = Merge.merge(wh.read(ref), batch, Seq("k"), Some("t"))
      .collect().toSet

    mt.upsert(batch)

    val after = wh.dataFiles(ref).toSet
    val survivors = before.filter(after.contains)
    // exactly the one file whose [min,max] covers keys 150-170 is gone
    assert(survivors.size === 3)
    survivors.foreach(p => assert(stamp(p) === beforeStamps(p)))
    assert(wh.read(ref).collect().toSet === expected)
  }

  test("crash recovery: interrupted replaceDataFiles heals on the next upsert (both arms)") {
    import spark.implicits._
    // The log append is the COMMIT POINT of replaceDataFiles. A crash
    // BEFORE it leaves only uncommitted straggler files — readers still
    // resolve the previous version, so the torn both-old-and-new-rows
    // state of a directory-defined table never exists. A crash AFTER it
    // needs no physical healing (replaced files are retired, not
    // deleted). recover() prunes stragglers / drops the journal, and
    // re-running the interrupted upsert converges either way.
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val whDir = tmpDir("wh-crash")
    val wh = new Warehouse(spark, whDir)
    val ref = TableRef("silver", "cdc", "facts")
    val mt = new MergeTable(spark, wh, ref, Seq("k"), Some("t"))
    val base = (1 to 400).map(i => (i, ts("2024-01-01 00:00:00"), i.toDouble))
      .toDF("k", "t", "v").repartitionByRange(4, $"k")
    mt.upsert(base)
    val beforeFiles = wh.dataFiles(ref).map(p => new java.io.File(p).getName).toSet
    val beforeRows = wh.read(ref).collect().toSet

    val batch = Seq(
      (150, ts("2024-02-01 00:00:00"), -150.0),
      (170, ts("2024-02-01 00:00:00"), -170.0)).toDF("k", "t", "v")
    val expected = Merge.merge(wh.read(ref), batch, Seq("k"), Some("t"))
      .collect().toSet

    // snapshot the pre-merge warehouse twice, then run the real merge
    // to harvest the files and the version it commits
    val fwdDir = tmpDir("wh-crash-fwd")
    val backDir = tmpDir("wh-crash-back")
    copyTree(java.nio.file.Paths.get(whDir), java.nio.file.Paths.get(fwdDir))
    copyTree(java.nio.file.Paths.get(whDir), java.nio.file.Paths.get(backDir))
    mt.upsert(batch)
    val tableDir = java.nio.file.Paths.get(wh.path(ref))
    val afterFiles = wh.dataFiles(ref).map(p => new java.io.File(p).getName).toSet
    val added = (afterFiles -- beforeFiles).toSeq.sorted
    val retired = (beforeFiles -- afterFiles).toSeq.sorted
    assert(added.nonEmpty && retired.nonEmpty)
    // retention: the retired files are OFF the version but ON the disk
    retired.foreach(n => assert(java.nio.file.Files.exists(tableDir.resolve(n))))

    val relTable = s"${ref.catalog}/${ref.schema}/${ref.table}"

    // ARM 1 — crash AFTER the commit, before the journal delete: adds +
    // committed version file + journal all present. The table is already
    // consistent; recovery only drops the journal.
    val fwdTable = java.nio.file.Paths.get(fwdDir).resolve(relTable)
    added.foreach { name =>
      java.nio.file.Files.copy(tableDir.resolve(name), fwdTable.resolve(name))
    }
    val committedVersion = wh.currentVersion(ref).get
    java.nio.file.Files.copy(
      tableDir.resolve(f"_graft_log/v$committedVersion%08d"),
      fwdTable.resolve(f"_graft_log/v$committedVersion%08d"))
    val fwdWh = new Warehouse(spark, fwdDir)
    fwdWh.writeTxnJournal(ref, added, retired)
    assert(fwdWh.read(ref).collect().toSet === expected) // already consistent
    new MergeTable(spark, fwdWh, ref, Seq("k"), Some("t")).upsert(batch)
    assert(fwdWh.read(ref).collect().toSet === expected)
    // recovery is a no-op once the journal is resolved
    assert(!fwdWh.recover(ref))
    assert(fwdWh.read(ref).collect().toSet === expected)

    // ARM 2 — crash mid-adds, BEFORE the commit: some new files landed,
    // the journal lists one that never did. No reader ever sees them —
    // the current version still resolves the pre-merge rows.
    val backTable = java.nio.file.Paths.get(backDir).resolve(relTable)
    added.foreach { name =>
      java.nio.file.Files.copy(tableDir.resolve(name), backTable.resolve(name))
    }
    val backWh = new Warehouse(spark, backDir)
    backWh.writeTxnJournal(ref, added :+ "never-moved.parquet", retired)
    assert(backWh.read(ref).collect().toSet === beforeRows) // no torn state
    assert(backWh.recover(ref)) // prunes the uncommitted stragglers
    added.foreach(n => assert(!java.nio.file.Files.exists(backTable.resolve(n))))
    assert(backWh.dataFiles(ref).map(p => new java.io.File(p).getName).toSet
      === beforeFiles)
    new MergeTable(spark, backWh, ref, Seq("k"), Some("t")).upsert(batch)
    assert(backWh.read(ref).collect().toSet === expected)
  }

  test("disjoint-range batch inserts without touching any existing file") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-incr2"))
    val ref = TableRef("silver", "cdc", "facts")
    val mt = new MergeTable(spark, wh, ref, Seq("k"), Some("t"))
    val base = (1 to 400).map(i => (i, ts("2024-01-01 00:00:00"), i.toDouble))
      .toDF("k", "t", "v").repartitionByRange(4, $"k")
    mt.upsert(base)
    val before = wh.dataFiles(ref)
    val beforeStamps = before.map(p => p -> stamp(p)).toMap

    mt.upsert(Seq((1000, ts("2024-02-01 00:00:00"), 1000.0)).toDF("k", "t", "v"))
    val afterInsert = wh.dataFiles(ref).toSet
    before.foreach { p =>
      assert(afterInsert.contains(p) && stamp(p) === beforeStamps(p))
    }
    assert(wh.read(ref).count() === 401)

    // the manifest LEARNED the new file's stats (not just conservative
    // keep-unknown): all four originals are provably disjoint for the
    // inserted key's range, leaving exactly the new file touched
    val Some((touched, untouched)) = wh.splitFilesByRange(ref, "k", 1000, 1000)
    assert(untouched.toSet === before.toSet)
    assert(touched.size === 1)

    // a follow-up update of the inserted key then rewrites THAT file
    // only — originals still intact
    mt.upsert(Seq((1000, ts("2024-03-01 00:00:00"), -1000.0)).toDF("k", "t", "v"))
    before.foreach { p => assert(stamp(p) === beforeStamps(p)) }
    import org.apache.spark.sql.functions.col
    assert(wh.read(ref).filter(col("k") === 1000)
      .as[(Int, Timestamp, Double)].collect().toSeq ===
      Seq((1000, ts("2024-03-01 00:00:00"), -1000.0)))
  }

  test("merges into a PARTITIONED table keep the layout: inserts land in partition dirs, rewrites re-route") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wh = new Warehouse(spark, tmpDir("wh-merge-part"))
    val ref = TableRef("silver", "cdc", "parted")
    wh.overwrite(ref,
      (1L to 40L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("k", "seg", "v"),
      partitionBy = Seq("seg"), statsColumns = Seq("k"))
    val mt = new MergeTable(spark, wh, ref, Seq("k"), None)

    // insert-only (disjoint range) batch: staged FLAT it produced a
    // mixed layout whose root-level rows partition discovery silently
    // DROPPED — the row must land inside its partition directory
    mt.upsert(Seq((100L, "g0", 100.0)).toDF("k", "seg", "v"))
    assert(wh.read(ref).count() === 41L)
    assert(wh.read(ref).filter(col("k") === 100L)
      .select("seg", "v").as[(String, Double)].collect().toSeq
      === Seq(("g0", 100.0)))
    assert(wh.dataFiles(ref).forall(_.contains("seg=g")),
      s"every committed file must sit in a partition dir: ${wh.dataFiles(ref)}")

    // a full-rewrite merge (key overlap across every file) must NOT
    // flatten the layout — partition pruning would silently lapse
    mt.upsert((1L to 40L).map(i => (i, s"g${i % 2}", i * 2.0))
      .toDF("k", "seg", "v"))
    assert(wh.dataFiles(ref).forall(_.contains("seg=g")),
      "a rewrite-path merge flattened the partition layout")
    assert(wh.read(ref).filter(col("seg") === "g1").count() === 20L)
    assert(wh.read(ref).agg(org.apache.spark.sql.functions.sum("v"))
      .as[Double].head() === (1 to 40).map(_ * 2.0).sum + 100.0)
  }

  test("replacePartitions on a PARTITIONED table lands replacements in partition dirs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wh = new Warehouse(spark, tmpDir("wh-repl-part"))
    val ref = TableRef("silver", "cdc", "repl_part")
    wh.overwrite(ref,
      (1L to 30L).map(i => (i, s"g${i % 3}", i * 1.0)).toDF("k", "seg", "v"),
      partitionBy = Seq("seg"), statsColumns = Seq("k"))
    val mt = new MergeTable(spark, wh, ref, Seq("k"), None)
    // keyed replace: k=5 replaced, k=6 tombstoned (no replacement row)
    mt.replacePartitions(
      Seq(5L, 6L).toDF("k"),
      Seq((5L, "g2", 50.0)).toDF("k", "seg", "v"))
    assert(wh.read(ref).count() === 29L)
    assert(wh.read(ref).filter(col("k") === 5L)
      .select("seg", "v").as[(String, Double)].collect().toSeq
      === Seq(("g2", 50.0)))
    assert(wh.read(ref).filter(col("k") === 6L).count() === 0L)
    assert(wh.dataFiles(ref).forall(_.contains("seg=g")),
      s"replacement files must sit in partition dirs: ${wh.dataFiles(ref)}")
    assert(wh.read(ref).filter(col("seg").isNull).count() === 0L)
  }

  test("concurrent writers to one merge target all land: lock + retry serialize them") {
    import spark.implicits._
    // four threads race upserts of DISJOINT key batches into a table
    // that does not exist yet: exactly one bootstrap wins (onlyIfAbsent
    // closes the check-then-create race), the rest conflict on the lock
    // or go version-stale and re-plan through MergeTable's retry loop.
    // Every batch must land exactly once — lost updates and doubled
    // bootstraps both change the final count.
    val wh = new Warehouse(spark, tmpDir("wh-multiwriter"))
    val ref = TableRef("silver", "cdc", "contended")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        try {
          val mt = new MergeTable(spark, wh, ref, Seq("k"), None)
          mt.upsert((0 until 50).map(i => (t * 1000L + i, s"w$t"))
            .toDF("k", "v").coalesce(1))
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek())}")
    val rows = wh.read(ref).as[(Long, String)].collect()
    assert(rows.length === 200)
    assert(rows.map(_._1).toSet.size === 200) // no duplicates, no losses
    (0 until 4).foreach { t =>
      assert(rows.count(_._2 == s"w$t") === 50, s"writer $t's batch lost")
    }
  }

  test("merge idempotence: merging the same batch twice is a no-op") {
    import spark.implicits._
    val target = Seq(("A", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val batch = Seq(
      ("A", ts("2024-02-01 00:00:00"), 10.0),
      ("B", ts("2024-01-05 00:00:00"), 2.0)).toDF("k", "t", "v")
    val once = Merge.merge(target, batch, Seq("k"), Some("t"))
    val twice = Merge.merge(once, batch, Seq("k"), Some("t"))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("schema evolution: new column null-backfills, dropped column survives") {
    import spark.implicits._
    import graft.catalog.{TableRef, Warehouse}
    val wh = new Warehouse(spark, tmpDir("wh-evolve"))
    val ref = TableRef("silver", "cdc", "evolving")
    val mt = new MergeTable(spark, wh, ref, Seq("k"), None, evolveSchema = true)
    mt.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    // batch adds a column: old rows get null w, matched row updates
    mt.upsert(Seq((2L, "b2", 20.0), (3L, "c", 30.0)).toDF("k", "v", "w"))
    val afterAdd = wh.read(ref).as[(Long, String, Option[Double])]
      .collect().toSet
    assert(afterAdd === Set((1L, "a", None), (2L, "b2", Some(20.0)),
      (3L, "c", Some(30.0))))
    // batch WITHOUT w (column dropped from the feed): w persists, null
    // on the new key, untouched elsewhere
    mt.upsert(Seq((4L, "d")).toDF("k", "v"))
    val afterDrop = wh.read(ref).as[(Long, String, Option[Double])]
      .collect().toSet
    assert(afterDrop === afterAdd + ((4L, "d", None)))
    // same-schema batches after evolution keep flowing (incremental path)
    mt.upsert(Seq((5L, "e", 50.0)).toDF("k", "v", "w"))
    assert(wh.read(ref).count() === 5)
  }

  test("mixed-era touched set after metadata-only ADD COLUMNS merges with the committed schema") {
    import spark.implicits._
    import graft.catalog.{TableRef, Warehouse}
    val wh = new Warehouse(spark, tmpDir("wh-mixed-era"))
    val ref = TableRef("silver", "cdc", "mixed")
    // era 1: files WITHOUT column w (bootstrap writes key stats so the
    // next upsert prunes instead of full-rewriting)
    val mt = new MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsert((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    // metadata-only widening, then era-2 files WITH real w values
    wh.addColumns(ref, Seq(org.apache.spark.sql.types.StructField(
      "w", org.apache.spark.sql.types.DoubleType)))
    wh.append(ref, (21L to 40L).map(i => (i, s"v$i", i * 1.0)).toDF("k", "v", "w"))
    // a batch whose key range straddles BOTH eras: the touched-file
    // read must use the COMMITTED schema — single-footer inference
    // over an era-1 file would drop w and null-backfill over the real
    // era-2 values, committing silent data loss
    val mt2 = new MergeTable(spark, wh, ref, Seq("k"), None)
    mt2.upsert(Seq((5L, "v5x", None: Option[Double]),
      (25L, "v25x", Some(250.0))).toDF("k", "v", "w"))
    val out = wh.read(ref).as[(Long, String, Option[Double])].collect().toMap2
    assert(out(25L) === ("v25x", Some(250.0)))
    assert(out(5L) === ("v5x", None))
    // every untouched era-2 row keeps its physical w value
    (26L to 40L).foreach(i => assert(out(i) === (s"v$i", Some(i * 1.0)),
      s"era-2 row $i lost its widened value"))
    (1L to 4L).foreach(i => assert(out(i) === (s"v$i", None)))
  }

  private implicit class Map2[K, A, B](rows: Array[(K, A, B)]) {
    def toMap2: Map[K, (A, B)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("schema evolution rejects type conflicts and keyless batches") {
    import spark.implicits._
    import graft.catalog.{TableRef, Warehouse}
    val wh = new Warehouse(spark, tmpDir("wh-evolve-bad"))
    val ref = TableRef("silver", "cdc", "conflicting")
    val mt = new MergeTable(spark, wh, ref, Seq("k"), None, evolveSchema = true)
    mt.upsert(Seq((1L, "a")).toDF("k", "v"))
    val conflict = intercept[IllegalArgumentException] {
      mt.upsert(Seq((2L, 2.0)).toDF("k", "v")) // v: string → double
    }
    assert(conflict.getMessage.contains("type conflict"))
    val keyless = intercept[IllegalArgumentException] {
      mt.upsert(Seq(("x", 1.0)).toDF("v", "w"))
    }
    assert(keyless.getMessage.contains("merge key"))
    // without the flag, a differing batch still fails loudly
    val strict = new MergeTable(spark, wh, ref, Seq("k"), None)
    intercept[Exception] {
      strict.upsert(Seq((9L, "z", 1.0)).toDF("k", "v", "w"))
    }
    ()
  }
}
