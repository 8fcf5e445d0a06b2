package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SHALLOW CLONE (Delta's `CREATE TABLE ... SHALLOW CLONE`): a
  * zero-copy clone whose version 1 lists the source snapshot's files
  * as FOREIGN entries, held readable by a retention PIN on the source.
  * The suite pins the whole contract: zero data movement, read
  * equivalence at the pinned version, source-churn isolation, the
  * vacuum pin keep-list and its release, the pin-first crash ordering,
  * DML refusal with the materialize remedy, the drop/rename pin
  * guards, SQL reads through the foreign rewrite arm, the CALL
  * procedures, and the streaming / change-feed refusals.
  */
class ShallowCloneSpec extends SparkSpec {

  private def dataFilesUnder(dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return Nil
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.endsWith(".parquet") &&
        !p.toString.contains("_graft_"))
      .toSeq
    finally s.close()
  }

  private def freshSource(nick: String): (Warehouse, TableRef, Long) = {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir(s"wh-shclone-$nick"))
    val ref = TableRef("silver", "g", "src")
    wh.overwrite(ref,
      (1L to 30L).map(i => (i, s"g${(i - 1) / 10}", i * 1.0))
        .toDF("k", "seg", "v"),
      partitionBy = Seq("seg"), statsColumns = Seq("k"))
    (wh, ref, wh.currentVersion(ref).get)
  }

  test("shallow clone: zero-copy commit, read equivalence, source-churn isolation, local appends") {
    import spark.implicits._
    val (wh, src, v) = freshSource("basic")
    val cl = TableRef("dev", "g", "cl")
    wh.cloneTable(src, cl, shallow = true)
    // ZERO-COPY WITNESS: the clone commit moved no data bytes — every
    // snapshot entry is foreign, and the clone directory holds only log
    val snap = wh.snapshot(cl).get
    assert(snap.files.nonEmpty &&
      snap.files.forall(_.startsWith(Warehouse.ForeignPrefix)))
    assert(dataFilesUnder(wh.path(cl)).isEmpty,
      "a shallow clone must write no data files")
    // retention pin landed on the source at the cloned version
    assert(wh.pinnedVersions(src) === Map(cl.toString -> v))
    // read equivalence at the pinned version
    val expect = (1L to 30L).map(i => (i, s"g${(i - 1) / 10}", i * 1.0)).toSet
    assert(wh.read(cl).select("k", "seg", "v")
      .as[(Long, String, Double)].collect().toSet === expect)
    // partition pruning still works through the foreign resolution
    assert(wh.read(cl).filter(col("seg") === "g1").count() === 10L)
    // SOURCE CHURN ISOLATION: overwrite + delete on the source after
    // the clone never shows through (vacuum not yet run; retired files
    // survive on disk)
    wh.overwrite(src, Seq((999L, "gX", 9.9)).toDF("k", "seg", "v"),
      partitionBy = Seq("seg"))
    wh.deleteWhere(src, col("k") === 999L)
    assert(wh.read(cl).select("k", "seg", "v")
      .as[(Long, String, Double)].collect().toSet === expect)
    // the clone takes LOCAL appends; compact packs them and SKIPS the
    // foreign entries (another table's bytes)
    wh.append(cl, Seq((100L, "g9", 100.0), (101L, "g9", 101.0))
      .toDF("k", "seg", "v"))
    assert(wh.read(cl).count() === 32L)
    wh.compact(cl, smallFileBytes = Long.MaxValue / 2,
      targetFileBytes = Long.MaxValue / 2)
    val after = wh.snapshot(cl).get.files
    assert(after.count(_.startsWith(Warehouse.ForeignPrefix))
      === snap.files.size, "compact must leave foreign entries alone")
    assert(wh.read(cl).count() === 32L)
  }

  test("vacuum keeps pinned files however far retention advances; drop(clone) releases the pin and the next vacuum reclaims") {
    import spark.implicits._
    val (wh, src, v) = freshSource("vacuum")
    val cl = TableRef("dev", "g", "cl")
    wh.cloneTable(src, cl, shallow = true)
    val pinnedFiles = wh.snapshot(src).get.files
    // push the pinned version far below retention
    wh.overwrite(src, Seq((1L, "gA", 1.0)).toDF("k", "seg", "v"))
    wh.overwrite(src, Seq((2L, "gB", 2.0)).toDF("k", "seg", "v"))
    wh.vacuum(src, keepVersions = 1)
    // the pinned version's files survived — the CLONE keeps reading
    // (source time travel below the horizon still refuses: the pin
    // keeps bytes for the clone, not the source's own history)
    assert(wh.read(cl).count() === 30L,
      "source vacuum broke a pinned shallow clone")
    // dropping the clone RELEASES the pin (the prescribed lifecycle)...
    wh.drop(cl)
    assert(wh.pinnedVersions(src).isEmpty,
      "drop(clone) must release its retention pin")
    // ...and the next vacuum reclaims the pinned bytes
    wh.vacuum(src, keepVersions = 1)
    val live = wh.snapshot(src).get.files.toSet
    val base = wh.path(src)
    pinnedFiles.filterNot(live.contains).foreach { f =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base, f)),
        s"released pinned file survived vacuum: $f")
    }
    assert(wh.read(src).count() === 1L)
  }

  test("crash between pin and clone commits leaves only a harmless extra-retention pin") {
    import spark.implicits._
    val (wh, src, v) = freshSource("crash")
    val cl = TableRef("dev", "g", "never")
    val pinnedFiles = wh.snapshot(src).get.files
    val base = wh.path(src)
    def onDisk(f: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(base, f))
    // simulate the crash: the PIN commit landed, the clone commit never
    // did (shallowClone's pin-first ordering)
    wh.commitMetaOnly(src, Map(Warehouse.pinMetaKey(cl) -> v.toString))
    assert(!wh.exists(cl))
    // the source stays fully usable; vacuum keeps the pinned bytes
    wh.overwrite(src, Seq((1L, "gA", 1.0)).toDF("k", "seg", "v"))
    wh.vacuum(src, keepVersions = 1)
    assert(pinnedFiles.forall(onDisk),
      "vacuum reclaimed files a (crashed) pin still holds")
    // the operator remedy: releasePin, then vacuum reclaims
    wh.releasePin(src, cl)
    assert(wh.pinnedVersions(src).isEmpty)
    wh.vacuum(src, keepVersions = 1)
    assert(pinnedFiles.forall(f => !onDisk(f)),
      "released pinned files must vacuum away")
    assert(wh.read(src).count() === 1L)
  }

  test("row-level DML refuses on a foreign clone naming the materialize remedy; drop(source) refuses while pinned") {
    import spark.implicits._
    val (wh, src, _) = freshSource("refuse")
    val cl = TableRef("dev", "g", "cl")
    wh.cloneTable(src, cl, shallow = true)
    val e1 = intercept[IllegalArgumentException](
      wh.deleteWhere(cl, col("k") === 1L))
    assert(e1.getMessage.contains("materialize"))
    val e2 = intercept[IllegalArgumentException](
      wh.updateWhere(cl, col("k") === 1L, Seq("v" -> lit(0.0))))
    assert(e2.getMessage.contains("materialize"))
    // the SOURCE refuses to drop while pinned, naming the clone and
    // the releasePin remedy — and succeeds once the clone is gone
    val e3 = intercept[IllegalArgumentException](wh.drop(src))
    assert(e3.getMessage.contains(cl.toString) &&
      e3.getMessage.contains("releasePin"))
    // MATERIALIZE upgrade path: the clone becomes its own bytes, DML
    // then works, and dropping the source (after releasing) is safe
    wh.overwrite(cl, wh.read(cl))
    assert(wh.snapshot(cl).get.files
      .forall(!_.startsWith(Warehouse.ForeignPrefix)))
    assert(wh.deleteWhere(cl, col("k") === 1L) === 1L)
    wh.releasePin(src, cl)
    wh.drop(src)
    assert(!wh.exists(src))
    assert(wh.read(cl).count() === 29L, "materialized clone outlives source")
  }

  test("renaming a shallow clone re-keys the source pin; renaming the source still refuses") {
    import spark.implicits._
    val (wh, src, v) = freshSource("rename")
    val cl = TableRef("dev", "g", "cl")
    val cl2 = TableRef("dev", "g", "cl2")
    wh.cloneTable(src, cl, shallow = true)
    wh.renameTable(cl, cl2)
    // pin follows the clone's NAME: old key released, new key pinned
    // at the same version — releasePin under the new name is now real
    assert(wh.pinnedVersions(src) === Map(cl2.toString -> v))
    assert(wh.read(cl2).count() === 30L)
    intercept[Exception](wh.read(cl).count())
    // the source still refuses to move while any pin holds
    val e = intercept[IllegalArgumentException](
      wh.renameTable(src, TableRef("silver", "g", "moved")))
    assert(e.getMessage.contains(cl2.toString))
    // drop of the RENAMED clone releases the re-keyed pin
    wh.drop(cl2)
    assert(wh.pinnedVersions(src).isEmpty)
  }

  test("SQL lifecycle: CALL clone(shallow), SELECT through the foreign rewrite arm, CALL release_pin") {
    import spark.implicits._
    val root = tmpDir("wh-shclone-sql")
    val wh = new Warehouse(spark, root)
    val cat = "graftshsql"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val src = TableRef("silver", "g", "src")
    wh.overwrite(src, (1L to 20L).map(i => (i, s"n$i")).toDF("k", "name"),
      statsColumns = Seq("k"))
    val v = wh.currentVersion(src).get
    val out = spark.sql(
      s"CALL $cat.system.clone('silver.g.src', 'dev.g.cl', shallow => true)")
      .collect()
    assert(out.head.getLong(2) === v)
    val cl = TableRef("dev", "g", "cl")
    assert(wh.snapshot(cl).get.files
      .forall(_.startsWith(Warehouse.ForeignPrefix)))
    // plain SELECT routes through DvReadRewrite's foreign arm (the
    // default file-index scan cannot resolve '@' entries)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.dev.g.cl")
      .head().getLong(0) === 20L)
    assert(spark.sql(
      s"SELECT sum(k) AS s FROM $cat.dev.g.cl WHERE k <= 5")
      .head().getLong(0) === 15L)
    // release through SQL; the pin is gone
    spark.sql(s"CALL $cat.system.release_pin('silver.g.src', 'dev.g.cl')")
    assert(wh.pinnedVersions(src).isEmpty)
  }

  test("streaming replay and the change feed refuse a foreign base loudly") {
    import spark.implicits._
    val root = tmpDir("wh-shclone-stream")
    val wh = new Warehouse(spark, root)
    val cat = "graftshstream"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val src = TableRef("silver", "g", "src")
    wh.overwrite(src, (1L to 20L).map(i => (i, s"n$i")).toDF("k", "name"))
    wh.setChangeDataFeed(src, enabled = true) // carries onto the clone
    wh.cloneTable(src, TableRef("dev", "g", "cl"), shallow = true)
    // change feed over the clone's foreign v1 refuses with the remedy
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.dev.g.cl.changes " +
        "WHERE _commit_version = 1").collect()
    }
    assert(Iterator.iterate(e1: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => Option(c.getMessage).exists(m =>
        m.contains("foreign") && m.contains("materialize"))), s"got: $e1")
    // a fresh stream over the foreign clone refuses loudly too (the
    // streaming path has no DvReadRewrite, so the refusal surfaces
    // from the reader gate — either message names the clone state and
    // the materializing remedy)
    val e2 = intercept[Exception] {
      val q = spark.readStream.table(s"$cat.dev.g.cl")
        .writeStream.format("memory").queryName("shclone_replay_refuse")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(30000) finally q.stop()
    }
    assert(Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => Option(c.getMessage).exists(m =>
        (m.contains("foreign") || m.contains("SHALLOW clone")) &&
          m.contains("materializ"))), s"got: $e2")
  }
}
