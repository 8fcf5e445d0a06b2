package graft.catalog

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The DSv2 streaming SINK over warehouse tables
  * ([[GraftStreamingWrite]]): `df.writeStream.toTable("graft....")` —
  * exactly-once epoch commits through the append protocol, partition
  * routing, Complete-mode replacement, catalog-to-catalog pipelines.
  */
class GraftStreamSinkSpec extends SparkSpec {

  private def registerCatalog(name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
  }

  test("writeStream.toTable appends exactly-once across restarts") {
    import spark.implicits._
    val root = tmpDir("wh-sink")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "sunk")
    wh.overwrite(ref, (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"),
      statsColumns = Seq("k"))
    registerCatalog("graftsink1", root)

    val in = tmpDir("sink-in")
    val ckpt = tmpDir("sink-ckpt")
    (41L to 70L).map(i => (i, s"v$i")).toDF("k", "v")
      .write.mode("append").parquet(in)
    def drain(): Unit =
      spark.readStream.schema("k LONG, v STRING").parquet(in)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("graftsink1.silver.g.sunk")
        .awaitTermination()
    drain()
    assert(wh.read(ref).as[(Long, String)].collect().sorted
      === (1L to 70L).map(i => (i, s"v$i")))

    // restart from the same checkpoint with new input: ONLY the new
    // files land, exactly once
    (71L to 90L).map(i => (i, s"v$i")).toDF("k", "v")
      .write.mode("append").parquet(in)
    drain()
    assert(wh.read(ref).as[(Long, String)].collect().sorted
      === (1L to 90L).map(i => (i, s"v$i")))

    // a further drain with no new input appends nothing
    drain()
    assert(wh.read(ref).count() === 90L)

    // the commits are STREAM ops carrying the txn stamp, and the stats
    // manifest kept pruning alive through the sink's appends
    val ops = wh.history(ref).select("operation").as[String].collect().toSeq
    assert(ops.count(_ == "STREAM") >= 2,
      s"expected streaming commits in the ledger, got $ops")
    assert(wh.currentVersion(ref).exists(v =>
      wh.commitMeta(ref, v).keys.exists(_.startsWith("graft.txn."))),
      "the exactly-once txn stamp must ride the commit meta")
  }

  test("commitStreamEpoch replays are idempotent; stale epoch stages are swept") {
    import spark.implicits._
    val root = tmpDir("wh-sink-replay")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "replayed")
    wh.overwrite(ref, Seq((1L, "a")).toDF("k", "v"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def stageEpoch(epoch: Long, rows: Seq[(Long, String)]): Seq[String] = {
      val stage = wh.streamStageDir(ref, "q-1", epoch)
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
        .parquet(stage.toString)
      fs.listStatus(stage).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).toSeq
    }

    val rels = stageEpoch(0L, Seq((2L, "b")))
    val v1 = wh.commitStreamEpoch(ref, "q-1", 0L, rels)
    assert(wh.read(ref).count() === 2L)
    assert(wh.streamTxnEpoch(ref, "q-1").contains(0L))

    // the same epoch re-staged and re-committed (crash replay): applies
    // NOTHING, sweeps its stage, version unchanged
    val rels2 = stageEpoch(0L, Seq((2L, "b")))
    val v2 = wh.commitStreamEpoch(ref, "q-1", 0L, rels2)
    assert(v2 === v1)
    assert(wh.read(ref).count() === 2L)
    assert(!fs.exists(wh.streamStageDir(ref, "q-1", 0L)),
      "a replayed epoch's stage dir must be swept")

    // a CRASHED earlier epoch's stage dir is swept when a later epoch
    // commits; an unrelated query's stage survives
    stageEpoch(1L, Seq((90L, "zz")))
    val otherStage = wh.streamStageDir(ref, "q-2", 0L)
    Seq((99L, "x")).toDF("k", "v").write.parquet(otherStage.toString)
    val rels3 = stageEpoch(2L, Seq((3L, "c")))
    wh.commitStreamEpoch(ref, "q-1", 2L, rels3)
    assert(wh.read(ref).count() === 3L)
    assert(!fs.exists(wh.streamStageDir(ref, "q-1", 1L)),
      "a dead earlier epoch's stage must be swept on a later commit")
    assert(fs.exists(otherStage),
      "another query's staged epoch must survive")

    // the exactly-once stamp survives an unrelated later commit (meta
    // carry-forward): txn still answers after a batch append
    wh.append(ref, Seq((4L, "d")).toDF("k", "v"))
    assert(wh.streamTxnEpoch(ref, "q-1").contains(2L))
  }

  test("streaming sink routes rows into partition directories") {
    import spark.implicits._
    val root = tmpDir("wh-sink-part")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "sunk_part")
    wh.overwrite(ref,
      Seq((1L, "a", "eu"), (2L, "b", "us")).toDF("k", "v", "region"),
      partitionBy = Seq("region"))
    registerCatalog("graftsink2", root)

    val in = tmpDir("sink-part-in")
    val ckpt = tmpDir("sink-part-ckpt")
    Seq((3L, "c", "eu"), (4L, "d", "apac"), (5L, "e", "us"))
      .toDF("k", "v", "region").write.mode("append").parquet(in)
    spark.readStream.schema("k LONG, v STRING, region STRING").parquet(in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable("graftsink2.silver.g.sunk_part")
      .awaitTermination()

    val snap = wh.snapshot(ref).get
    assert(snap.files.count(_.startsWith("region=apac/")) >= 1,
      s"a new partition value must create its directory: ${snap.files}")
    assert(snap.files.forall(_.contains("region=")),
      s"every committed file must live in a partition dir: ${snap.files}")
    assert(wh.read(ref).as[(Long, String, String)].collect().sorted
      === Seq((1L, "a", "eu"), (2L, "b", "us"), (3L, "c", "eu"),
        (4L, "d", "apac"), (5L, "e", "us")))
    // and SQL partition pruning still works over the sink's files
    assert(spark.sql(
      "SELECT k FROM graftsink2.silver.g.sunk_part WHERE region = 'apac'")
      .as[Long].collect().toSeq === Seq(4L))
  }

  test("Complete output mode replaces the table every epoch") {
    import spark.implicits._
    val root = tmpDir("wh-sink-complete")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("gold", "g", "counts")
    // schema-compatible seed; Complete mode replaces it wholesale
    wh.overwrite(ref, Seq(("seed", -1L)).toDF("v", "n"))
    registerCatalog("graftsink3", root)

    val in = tmpDir("sink-complete-in")
    val ckpt = tmpDir("sink-complete-ckpt")
    Seq("a", "a", "b").toDF("v").write.mode("append").parquet(in)
    def drain(): Unit =
      spark.readStream.schema("v STRING").parquet(in)
        .groupBy($"v").agg(org.apache.spark.sql.functions.count("*").as("n"))
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("graftsink3.gold.g.counts")
        .awaitTermination()
    drain()
    assert(wh.read(ref).as[(String, Long)].collect().sorted
      === Seq(("a", 2L), ("b", 1L)))
    // more input: the epoch's FULL aggregate replaces the previous one
    Seq("b", "c").toDF("v").write.mode("append").parquet(in)
    drain()
    assert(wh.read(ref).as[(String, Long)].collect().sorted
      === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("a crashed epoch's moved-but-uncommitted files heal; the replay lands once") {
    import spark.implicits._
    val root = tmpDir("wh-sink-crash")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "sunk_crash")
    wh.overwrite(ref, Seq((1L, "a")).toDF("k", "v"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tablePath = new org.apache.hadoop.fs.Path(wh.path(ref))

    // fabricate the crash: stage an epoch, write the intent journal,
    // move the file into the table — and die before the commit
    val stage = wh.streamStageDir(ref, "q-crash", 0L)
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(stage.toString)
    val rel = fs.listStatus(stage).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).head
    wh.writeTxnJournal(ref, Seq(rel), Nil)
    assert(fs.rename(new org.apache.hadoop.fs.Path(stage, rel),
      new org.apache.hadoop.fs.Path(tablePath, rel)))

    // readers never saw the straggler (the log defines contents)...
    assert(wh.read(ref).count() === 1L)
    // ...and recovery removes it physically
    assert(wh.recover(ref))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tablePath, rel)),
      "an uncommitted epoch's moved file must be healed away")

    // the replayed epoch (fresh staging, same epoch id) lands exactly once
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(stage.toString)
    val rel2 = fs.listStatus(stage).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSeq
    wh.commitStreamEpoch(ref, "q-crash", 0L, rel2)
    assert(wh.read(ref).as[(Long, String)].collect().sorted
      === Seq((1L, "a"), (2L, "b")))
  }

  test("compactAtFiles bounds a long-running sink's file count") {
    import spark.implicits._
    val root = tmpDir("wh-sink-compact")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "sunk_bounded")
    wh.overwrite(ref, Seq((0L, "seed")).toDF("k", "v"))
    registerCatalog("graftsink5", root)

    val in = tmpDir("sink-compact-in")
    val ckpt = tmpDir("sink-compact-ckpt")
    // 6 single-file epochs (one file per trigger), each committing its
    // own small file — without maintenance the table ends ~7 files
    (1L to 6L).foreach { i =>
      Seq((i, s"v$i")).toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(in)
    }
    spark.readStream.schema("k LONG, v STRING").parquet(in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .option("maxFilesPerTrigger", "1")
      .option("compactAtFiles", "3")
      .trigger(Trigger.AvailableNow())
      .toTable("graftsink5.silver.g.sunk_bounded")
      .awaitTermination()
    assert(wh.read(ref).as[(Long, String)].collect().sorted
      === (0L to 6L).map(i => (i, if (i == 0) "seed" else s"v$i")))
    assert(wh.dataFiles(ref).size <= 4,
      s"compactAtFiles=3 must bound the live file count, " +
        s"got ${wh.dataFiles(ref).size}")
    val ops = wh.history(ref).select("operation").as[String].collect().toSeq
    assert(ops.contains("COMPACT"),
      s"in-loop maintenance must appear in the ledger: $ops")
  }

  test("catalog-to-catalog: readStream.table into writeStream.toTable") {
    import spark.implicits._
    val root = tmpDir("wh-sink-c2c")
    val wh = new Warehouse(spark, root)
    val src = TableRef("silver", "g", "c2c_src")
    val dst = TableRef("silver", "g", "c2c_dst")
    wh.overwrite(src, (1L to 30L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(2, $"k"), statsColumns = Seq("k"))
    wh.overwrite(dst, Seq.empty[(Long, String)].toDF("k", "v"))
    registerCatalog("graftsink4", root)

    val ckpt = tmpDir("sink-c2c-ckpt")
    def pump(): Unit =
      spark.readStream.table("graftsink4.silver.g.c2c_src")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("graftsink4.silver.g.c2c_dst")
        .awaitTermination()
    pump()
    assert(wh.read(dst).as[(Long, String)].collect().sorted
      === (1L to 30L).map(i => (i, s"v$i")))

    // new source commits flow through on the next pump, exactly once
    val mt = new graft.sinks.MergeTable(spark, wh, src, Seq("k"), None)
    mt.upsert((31L to 45L).map(i => (i, s"v$i")).toDF("k", "v"))
    pump()
    assert(wh.read(dst).as[(Long, String)].collect().sorted
      === (1L to 45L).map(i => (i, s"v$i")))
  }
}
