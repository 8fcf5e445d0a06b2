package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.{GraftCatalog, TableRef, Warehouse}

/** The Delta MERGE clause surface beyond update-all/insert-all
  * ([[Merge.applyClauses]] / [[MergeTable.upsertClauses]] / the
  * SqlMerge clause route): conditional matched updates, matched
  * DELETE, conditional INSERT, NOT MATCHED BY SOURCE DELETE, clause
  * order, file pruning, CDF classification, and the SQL surface.
  */
class MergeClausesSpec extends SparkSpec {

  private def fresh(nick: String, rows: Long = 30L)
      : (Warehouse, TableRef, MergeTable) = {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir(s"wh-clauses-$nick"))
    val ref = TableRef("silver", "cdc", nick)
    wh.overwrite(ref,
      (1L to rows).map(i => (i, s"n$i", i * 1.0)).toDF("k", "name", "v")
        .repartitionByRange(3, col("k")),
      statsColumns = Seq("k"))
    (wh, ref, new MergeTable(spark, wh, ref, Seq("k"), None))
  }

  test("CDC apply: op='D' deletes, others update, inserts filtered; extra source columns ride") {
    import spark.implicits._
    val (wh, ref, mt) = fresh("cdcapply")
    // source carries an op column the target lacks
    val batch = Seq(
      (3L, "upd3", 3.3, "U"),
      (5L, "x", 0.0, "D"),
      (31L, "new31", 31.0, "I"),
      (32L, "x", 0.0, "D")) // delete of a nonexistent key: no-op insert-wise
      .toDF("k", "name", "v", "op")
    mt.upsertClauses(batch,
      matched = Seq(
        Some("__src_op = 'D'") -> "delete",
        None -> "update"),
      insert = Some(Some("__src_op <> 'D'")))
    val got = wh.read(ref).select("k", "name").as[(Long, String)]
      .collect().toMap
    assert(!got.contains(5L), "matched DELETE must remove the row")
    assert(got(3L) === "upd3", "matched fallthrough must update")
    assert(got(31L) === "new31", "filtered insert must land")
    assert(!got.contains(32L), "an op='D' unmatched row must NOT insert")
    assert(got.size === 30, "29 survivors + 1 insert")
    assert(got(7L) === "n7", "unmatched target rows keep their values")
  }

  test("clause ORDER decides: first matching clause wins") {
    import spark.implicits._
    val (wh, ref, mt) = fresh("order")
    val batch = Seq((3L, "upd", 0.0, "D")).toDF("k", "name", "v", "op")
    // update listed FIRST and unconditional: the later delete never fires
    mt.upsertClauses(batch,
      matched = Seq(None -> "update", Some("__src_op = 'D'") -> "delete"),
      insert = None)
    assert(wh.read(ref).filter(col("k") === 3L)
      .select("name").as[String].head() === "upd")
    assert(wh.read(ref).count() === 30L)
  }

  test("key-range pruning holds for clause merges: untouched files keep their bytes") {
    import spark.implicits._
    val (wh, ref, mt) = fresh("pruned")
    val before = wh.snapshot(ref).get.files.toSet
    // keys 1-5 live in the first range file only
    mt.upsertClauses(Seq((2L, "u2", 2.2, "U")).toDF("k", "name", "v", "op"),
      matched = Seq(None -> "update"), insert = Some(None))
    val after = wh.snapshot(ref).get.files.toSet
    assert((before intersect after).nonEmpty,
      "a narrow clause merge must leave out-of-range files untouched")
    assert(wh.read(ref).filter(col("k") === 2L)
      .select("name").as[String].head() === "u2")
  }

  test("NOT MATCHED BY SOURCE DELETE: full-sync replication drops vanished rows") {
    import spark.implicits._
    val (wh, ref, mt) = fresh("bysource")
    // the source is the NEW full state: only even keys survive
    val state = (2L to 30L by 2).map(i => (i, s"s$i", i * 2.0))
      .toDF("k", "name", "v")
    mt.upsertClauses(state,
      matched = Seq(None -> "update"),
      insert = Some(None),
      bySource = Seq(None))
    val got = wh.read(ref).select("k", "name").as[(Long, String)]
      .collect().toMap
    assert(got.keySet === (2L to 30L by 2).toSet,
      "odd keys vanished from the source and must delete")
    assert(got(4L) === "s4", "survivors take the source values")
    // conditional by-source: only drop the sub-slice the condition names
    val (wh2, ref2, mt2) = fresh("bysourcecond")
    mt2.upsertClauses((1L to 10L).map(i => (i, s"s$i", i * 1.0))
        .toDF("k", "name", "v"),
      matched = Seq(None -> "update"), insert = None,
      bySource = Seq(Some("k > 25")))
    assert(wh2.read(ref2).select("k").as[Long].collect().toSet ===
      (1L to 25L).toSet, "only by-source rows matching the condition drop")
  }

  test("CDF classifies clause merges: insert / update pair / delete change rows") {
    import spark.implicits._
    val root = tmpDir("wh-clauses-cdf")
    val wh = new Warehouse(spark, root)
    val cat = "graftclausescdf"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val ref = TableRef("silver", "cdc", "cdf")
    wh.overwrite(ref,
      (1L to 30L).map(i => (i, s"n$i", i * 1.0)).toDF("k", "name", "v"),
      statsColumns = Seq("k"))
    wh.setChangeDataFeed(ref, enabled = true)
    val mt = new MergeTable(spark, wh, ref, Seq("k"), None)
    mt.upsertClauses(Seq(
        (3L, "u3", 3.3, "U"), (5L, "x", 0.0, "D"), (31L, "new", 31.0, "I"))
        .toDF("k", "name", "v", "op"),
      matched = Seq(Some("__src_op = 'D'") -> "delete", None -> "update"),
      insert = Some(Some("__src_op <> 'D'")))
    val v = wh.currentVersion(ref).get
    val feed = spark.sql(
      s"SELECT k, ${Warehouse.ChangeTypeCol} FROM $cat.silver.cdc.cdf.changes " +
        s"WHERE _commit_version = $v")
      .as[(Long, String)].collect().toSet
    assert(feed === Set((3L, "update_preimage"), (3L, "update_postimage"),
      (5L, "delete"), (31L, "insert")))
  }

  test("SQL MERGE with conditional, delete, and by-source clauses routes to the engine") {
    import spark.implicits._
    val root = tmpDir("wh-clauses-sql")
    val wh = new Warehouse(spark, root)
    val cat = "graftclauses"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val ref = TableRef("silver", "cdc", "sqlclauses")
    wh.overwrite(ref, (1L to 20L).map(i => (i, s"n$i")).toDF("k", "name"),
      statsColumns = Seq("k"))
    Seq((3L, "u3", "U"), (5L, "x", "D"), (21L, "new", "I"))
      .toDF("k", "name", "op").createOrReplaceTempView("cdc_batch")
    spark.sql(
      s"""MERGE INTO $cat.silver.cdc.sqlclauses t
         |USING cdc_batch s ON t.k = s.k
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *""".stripMargin)
    val got = spark.sql(s"SELECT k, name FROM $cat.silver.cdc.sqlclauses")
      .as[(Long, String)].collect().toMap
    assert(!got.contains(5L) && got(3L) === "u3" && got(21L) === "new" &&
      got.size === 20)
    assert(wh.commitMeta(ref, wh.currentVersion(ref).get)
      .get(Warehouse.OpMeta).contains("MERGE"))
    // by-source through SQL: sync to the batch's key set
    Seq((3L, "only3")).toDF("k", "name").createOrReplaceTempView("sync_batch")
    spark.sql(
      s"""MERGE INTO $cat.silver.cdc.sqlclauses t
         |USING sync_batch s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(spark.sql(s"SELECT k, name FROM $cat.silver.cdc.sqlclauses")
      .as[(Long, String)].collect().toSeq === Seq((3L, "only3")))
    // the classic unconditional shape still routes to the plain upsert
    // (not the clause command): stale-row quirk etc. stay intact
    Seq((3L, "again"), (40L, "forty")).toDF("k", "name")
      .createOrReplaceTempView("plain_batch")
    spark.sql(
      s"""MERGE INTO $cat.silver.cdc.sqlclauses t
         |USING plain_batch s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.silver.cdc.sqlclauses")
      .head().getLong(0) === 2L)
  }
}
