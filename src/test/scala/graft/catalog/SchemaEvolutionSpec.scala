package graft.catalog

import graft.SparkSpec

/** Metadata-only ADD COLUMNS ([[Warehouse.addColumns]]): the schema
  * rides the snapshot, reads null-backfill by name across every
  * surface, time travel keeps the old shape, and later writes mix
  * valued and legacy files freely.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("addColumns widens metadata-only: null backfill, SQL parity, time travel, mixed files") {
    import spark.implicits._
    import org.apache.spark.sql.types.{DoubleType, StructField}
    val root = tmpDir("wh-addcol")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "widened")
    wh.overwrite(ref, (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"))  // v1
    val dataFilesBefore = wh.dataFiles(ref).toSet

    val v2 = wh.addColumns(ref, Seq(StructField("score", DoubleType)))  // v2
    assert(v2 === 2L)
    // ZERO data movement: the file set is bit-identical
    assert(wh.dataFiles(ref).toSet === dataFilesBefore)

    // Scala read: new column surfaces as null on every legacy row
    val read = wh.read(ref)
    assert(read.columns.toSeq === Seq("k", "v", "score"))
    assert(read.filter($"score".isNotNull).count() === 0L)

    // SQL read through the catalog agrees
    spark.conf.set("spark.sql.catalog.graftwide", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftwide.root", root)
    val sqlRead = spark.sql("SELECT k, v, score FROM graftwide.silver.g.widened")
    assert(sqlRead.count() === 10L)
    assert(sqlRead.filter("score IS NOT NULL").count() === 0L)

    // a write carrying values mixes with legacy files (SQL INSERT)    // v3
    spark.sql("INSERT INTO graftwide.silver.g.widened VALUES (11, 'v11', 2.5)")
    val mixed = spark.sql(
      "SELECT k, score FROM graftwide.silver.g.widened WHERE score IS NOT NULL")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(mixed === Seq((11L, 2.5)))
    assert(wh.read(ref).count() === 11L)

    // time travel to the pre-widening version keeps the OLD schema
    assert(wh.readVersion(ref, 1L).columns.toSeq === Seq("k", "v"))

    // collisions refuse (case-insensitive, like Spark resolution)
    intercept[IllegalArgumentException] {
      wh.addColumns(ref, Seq(StructField("V", DoubleType)))
    }

    // the SQL lifecycle: CALL add_columns with DDL text              // v4
    val r = spark.sql(
      "CALL graftwide.system.add_columns('silver.g.widened', 'note STRING')")
      .head()
    assert(r.getString(1) === "note")
    assert(wh.read(ref).columns.toSeq === Seq("k", "v", "score", "note"))

    // the ledger names the widenings
    val ops = wh.history(ref).select("operation").as[String].collect().toSeq
    assert(ops.count(_ == "ADD_COLUMNS") === 2)
  }

  test("dropColumns narrows metadata-only; refusal arms hold") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField}
    val root = tmpDir("wh-dropcol")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "narrowed")
    wh.overwrite(ref,
      Seq((1L, "a", 10L, "eu"), (2L, "b", 20L, "us"))
        .toDF("k", "v", "n", "p"),
      partitionBy = Seq("p"))
    val filesBefore = wh.dataFiles(ref).toSet

    wh.dropColumns(ref, Seq("n"))
    assert(wh.dataFiles(ref).toSet === filesBefore, "zero data movement")
    assert(wh.read(ref).columns.toSeq === Seq("k", "v", "p"))
    // time travel below the narrow keeps the column
    assert(wh.readVersion(ref, 1L).columns.contains("n"))
    // SQL agrees
    spark.conf.set("spark.sql.catalog.graftnarrow", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftnarrow.root", root)
    assert(spark.sql("SELECT * FROM graftnarrow.silver.g.narrowed")
      .columns.toSeq === Seq("k", "v", "p"))
    // re-adding the dropped name is REFUSED: live files still carry
    // its bytes, and a declared-schema read would resurrect them (the
    // hazard Delta's column mapping exists for)
    val e = intercept[IllegalArgumentException] {
      wh.addColumns(ref, Seq(StructField("n", LongType)))
    }
    assert(e.getMessage.contains("previously dropped"))

    // refusals: partition column, constraint-referenced column
    intercept[IllegalArgumentException] { wh.dropColumns(ref, Seq("p")) }
    wh.setCheckConstraint(ref, "v_nonempty", "length(v) > 0")
    intercept[IllegalArgumentException] { wh.dropColumns(ref, Seq("v")) }
    wh.dropCheckConstraint(ref, "v_nonempty")

    // a full overwrite writes fresh files: the tombstone clears and the
    // name re-adds as genuinely all-null
    wh.overwrite(ref, wh.read(ref))
    wh.addColumns(ref, Seq(StructField("n", LongType)))
    assert(wh.read(ref).filter($"n".isNotNull).count() === 0L,
      "post-rewrite re-add must start all-null")

    // SQL lifecycle
    spark.sql("CALL graftnarrow.system.drop_columns('silver.g.narrowed', 'n')")
    assert(!wh.read(ref).columns.contains("n"))
  }

  test("merges after a widening demand the new column or evolveSchema") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField}
    val root = tmpDir("wh-addcol-merge")
    val wh = new Warehouse(spark, root)
    val ref = TableRef("silver", "g", "widened_m")
    wh.overwrite(ref, Seq((1L, "a")).toDF("k", "v"), statsColumns = Seq("k"))
    wh.addColumns(ref, Seq(StructField("n", LongType)))
    // an old-shape batch fails loudly (schema signature mismatch)
    intercept[Exception] {
      new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
        .upsert(Seq((2L, "b")).toDF("k", "v"))
    }
    // evolveSchema widens the batch and fills values
    new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None,
      evolveSchema = true)
      .upsert(Seq((2L, "b", 7L)).toDF("k", "v", "n"))
    assert(wh.read(ref).as[(Long, String, Option[Long])].collect().sorted
      === Seq((1L, "a", None), (2L, "b", Some(7L))))
  }
}
