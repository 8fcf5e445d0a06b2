package graft.catalog

import java.io.File
import java.nio.file.{Files => JFiles, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Idempotent file-level batch ingestion ([[Warehouse.copyInto]] /
  * `CALL graft.system.copy_into`): exactly-once per source file via a
  * durable ledger that rides commit meta — re-runs are no-ops, new
  * shards load alone, changed-in-place files refuse without `force`,
  * and RESTORE rolls the ledger back with the data.
  */
class CopyIntoSpec extends SparkSpec {

  private def writeShard(df: org.apache.spark.sql.DataFrame,
                         srcDir: File, name: String): File = {
    val tmp = new File(srcDir.getParentFile, s"tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new File(srcDir, s"$name.parquet")
    JFiles.move(part.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
    dst
  }

  test("copyInto loads each file exactly once; re-run no-op; new shard loads alone") {
    import spark.implicits._
    val base = new File(tmpDir("wh-copyinto"))
    val srcDir = new File(base, "src"); srcDir.mkdirs()
    val wh = new Warehouse(spark, s"$base/wh")
    val ref = TableRef("silver", "raw", "crawl")
    writeShard((1L to 10L).toDF("k"), srcDir, "a")
    writeShard((11L to 20L).toDF("k"), srcDir, "b")
    val (f1, r1, v1) = wh.copyInto(ref, srcDir.toString)
    assert(f1 === 2 && r1 === 20L)
    assert(wh.read(ref).count() === 20L)
    // re-run: nothing new, no commit
    val (f2, r2, v2) = wh.copyInto(ref, srcDir.toString)
    assert(f2 === 0 && r2 === 0L && v2 === v1,
      "a re-run must load nothing and commit nothing")
    // a new shard loads exactly its own rows
    writeShard((21L to 25L).toDF("k"), srcDir, "c")
    val (f3, r3, _) = wh.copyInto(ref, srcDir.toString)
    assert(f3 === 1 && r3 === 5L)
    assert(wh.read(ref).as[Long].collect().sorted.toSeq === (1L to 25L))
    // the op is visible in history
    assert(wh.commitMeta(ref, wh.currentVersion(ref).get)
      .get(Warehouse.OpMeta).contains("COPY_INTO"))
  }

  test("changed-in-place file refuses without force; force re-loads it") {
    import spark.implicits._
    val base = new File(tmpDir("wh-copyinto-chg"))
    val srcDir = new File(base, "src"); srcDir.mkdirs()
    val wh = new Warehouse(spark, s"$base/wh")
    val ref = TableRef("silver", "raw", "chg")
    val shard = writeShard((1L to 10L).toDF("k"), srcDir, "a")
    wh.copyInto(ref, srcDir.toString)
    // rewrite the shard in place (different rows, different mtime)
    writeShard((101L to 105L).toDF("k"), srcDir, "a")
    shard.setLastModified(System.currentTimeMillis() + 5000)
    val e = intercept[IllegalArgumentException](
      wh.copyInto(ref, srcDir.toString))
    assert(e.getMessage.contains("changed in place"))
    assert(wh.read(ref).count() === 10L, "the refusal must load nothing")
    // force: the caller owns the duplication semantics
    val (f, r, _) = wh.copyInto(ref, srcDir.toString, force = true)
    assert(f === 1 && r === 5L)
    assert(wh.read(ref).count() === 15L)
  }

  test("RESTORE rolls the ledger back: rolled-back files re-load") {
    import spark.implicits._
    val base = new File(tmpDir("wh-copyinto-restore"))
    val srcDir = new File(base, "src"); srcDir.mkdirs()
    val wh = new Warehouse(spark, s"$base/wh")
    val ref = TableRef("silver", "raw", "rst")
    writeShard((1L to 10L).toDF("k"), srcDir, "a")
    val (_, _, v1) = wh.copyInto(ref, srcDir.toString)
    writeShard((11L to 20L).toDF("k"), srcDir, "b")
    wh.copyInto(ref, srcDir.toString)
    assert(wh.read(ref).count() === 20L)
    wh.restore(ref, v1)
    assert(wh.read(ref).count() === 10L)
    // the ledger pointer rolled back with the data: shard b is unknown
    // again and re-loads, landing the table back at 20 rows once
    val (f, r, _) = wh.copyInto(ref, srcDir.toString)
    assert(f === 1 && r === 10L)
    assert(wh.read(ref).as[Long].collect().sorted.toSeq === (1L to 20L))
  }

  test("concurrent copyInto, FULL overlap: detect the double-load, roll back, retry is a no-op") {
    import spark.implicits._
    val base = new File(tmpDir("wh-copyinto-race-ovl"))
    val srcDir = new File(base, "src"); srcDir.mkdirs()
    val wh = new Warehouse(spark, s"$base/wh")
    val ref = TableRef("silver", "raw", "race_ovl")
    writeShard((1L to 10L).toDF("k"), srcDir, "a")
    wh.copyInto(ref, srcDir.toString) // seed: shard a loaded
    writeShard((11L to 20L).toDF("k"), srcDir, "b")
    writeShard((21L to 25L).toDF("k"), srcDir, "c")
    // interleave: a concurrent copyInto of the SAME source lands after
    // our ledger snapshot (which saw only shard a loaded) and before
    // our commit — it loads b and c first, so our commit double-loads
    wh.copyIntoInterleave = () => {
      val (fi, ri, _) = new Warehouse(spark, s"$base/wh")
        .copyInto(ref, srcDir.toString)
      assert(fi === 2 && ri === 15L, "interloper loads b and c")
    }
    val (f, r, _) = wh.copyInto(ref, srcDir.toString)
    assert(f === 0 && r === 0L,
      "retry after rollback must load nothing — the interloper " +
        "already landed both shards")
    assert(wh.read(ref).as[Long].collect().sorted.toSeq === (1L to 25L),
      "every row exactly once despite the race")
    val (f2, r2, _) = wh.copyInto(ref, srcDir.toString)
    assert(f2 === 0 && r2 === 0L, "re-run stays a no-op")
  }

  test("concurrent copyInto, PARTIAL overlap: rollback-retry lands only the remainder") {
    import spark.implicits._
    val base = new File(tmpDir("wh-copyinto-race-part"))
    val srcDir = new File(base, "src"); srcDir.mkdirs()
    val wh = new Warehouse(spark, s"$base/wh")
    val ref = TableRef("silver", "raw", "race_part")
    writeShard((1L to 10L).toDF("k"), srcDir, "a")
    wh.copyInto(ref, srcDir.toString)
    writeShard((11L to 20L).toDF("k"), srcDir, "b")
    writeShard((21L to 25L).toDF("k"), srcDir, "c")
    // the interloper sees only shard b (c is parked outside its listing
    // for the duration of its run), so the overlap is partial: our
    // rollback-retry must land exactly the non-overlapping shard c
    wh.copyIntoInterleave = () => {
      val c = new File(srcDir, "c.parquet")
      val hidden = new File(base, "c.hold")
      JFiles.move(c.toPath, hidden.toPath)
      try {
        val (fi, ri, _) = new Warehouse(spark, s"$base/wh")
          .copyInto(ref, srcDir.toString)
        assert(fi === 1 && ri === 10L, "interloper loads only b")
      } finally JFiles.move(hidden.toPath, c.toPath)
    }
    val (f, r, _) = wh.copyInto(ref, srcDir.toString)
    assert(f === 1 && r === 5L,
      "retry after rollback must land exactly the non-overlapping shard c")
    assert(wh.read(ref).as[Long].collect().sorted.toSeq === (1L to 25L),
      "b exactly once (interloper's), c exactly once (our retry)")
  }

  test("concurrent copyInto, DISJOINT files: the heal merges both ledgers into the latest pointer") {
    import spark.implicits._
    val base = new File(tmpDir("wh-copyinto-race-dis"))
    val srcOurs = new File(base, "ours"); srcOurs.mkdirs()
    val srcTheirs = new File(base, "theirs"); srcTheirs.mkdirs()
    val wh = new Warehouse(spark, s"$base/wh")
    val ref = TableRef("silver", "raw", "race_dis")
    writeShard((1L to 10L).toDF("k"), srcOurs, "a")
    wh.copyInto(ref, srcOurs.toString)
    writeShard((11L to 20L).toDF("k"), srcOurs, "b")
    writeShard((21L to 30L).toDF("k"), srcTheirs, "d")
    wh.copyIntoInterleave = () => {
      val (fi, ri, _) = new Warehouse(spark, s"$base/wh")
        .copyInto(ref, srcTheirs.toString)
      assert(fi === 1 && ri === 10L, "interloper loads d")
    }
    val (f, r, _) = wh.copyInto(ref, srcOurs.toString)
    assert(f === 1 && r === 10L, "our copy lands b")
    assert(wh.read(ref).as[Long].collect().sorted.toSeq === (1L to 30L))
    // the heal commit merged the interloper's entries into the latest
    // pointer: a re-run of EITHER source loads nothing
    assert(wh.commitMeta(ref, wh.currentVersion(ref).get)
      .get(Warehouse.OpMeta).contains("COPY_INTO_HEAL"),
      "disjoint interleave must leave a heal commit on top")
    val (f2, r2, _) = wh.copyInto(ref, srcOurs.toString)
    val (f3, r3, _) = wh.copyInto(ref, srcTheirs.toString)
    assert(f2 === 0 && r2 === 0L && f3 === 0 && r3 === 0L,
      "the healed ledger must cover both batches — re-runs are no-ops")
  }

  test("CALL graft.system.copy_into: SQL surface, json format option") {
    import spark.implicits._
    val base = new File(tmpDir("wh-copyinto-sql"))
    val srcDir = new File(base, "src"); srcDir.mkdirs()
    val root = s"$base/wh"
    val wh = new Warehouse(spark, root)
    val cat = "graftcpy"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // json shard (exercises the format pass-through)
    val tmp = new File(base, "tmp_j")
    (1L to 4L).map(i => (i, s"n$i")).toDF("k", "v")
      .coalesce(1).write.json(tmp.toString)
    val part = tmp.listFiles().find(_.getName.endsWith(".json")).get
    JFiles.move(part.toPath, new File(srcDir, "j1.json").toPath)
    val row = spark.sql(s"CALL $cat.system.copy_into('silver.raw.j', " +
      s"'${srcDir}', format => 'json')").head()
    assert(row.getAs[Int]("files_loaded") === 1)
    assert(row.getAs[Long]("rows_loaded") === 4L)
    val again = spark.sql(s"CALL $cat.system.copy_into('silver.raw.j', " +
      s"'${srcDir}', format => 'json')").head()
    assert(again.getAs[Int]("files_loaded") === 0)
    assert(wh.read(TableRef("silver", "raw", "j")).count() === 4L)
  }
}
