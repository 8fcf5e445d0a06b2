package graft.catalog

import graft.SparkSpec

class WarehouseSpec extends SparkSpec {

  test("round-trip, overwrite swap, truncate, views") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh"))
    val ref = TableRef("bronze", "brapi", "assets")

    assert(!wh.exists(ref))
    wh.overwrite(ref, Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    assert(wh.exists(ref))
    assert(wh.read(ref).count() === 2)

    // overwrite replaces, not appends
    wh.overwrite(ref, Seq(("c", 3)).toDF("k", "v"))
    assert(wh.read(ref).as[(String, Int)].collect().toSeq === Seq(("c", 3)))

    val view = wh.registerView(ref)
    assert(view === "bronze_brapi_assets")
    assert(spark.sql(s"SELECT v FROM $view").as[Int].collect().toSeq === Seq(3))

    wh.truncate(ref)
    assert(wh.exists(ref) && wh.read(ref).count() === 0)
    // schema survives truncate
    assert(wh.read(ref).columns.toSeq === Seq("k", "v"))

    wh.drop(ref)
    assert(!wh.exists(ref))
  }

  test("three-part name parsing validates") {
    assert(TableRef.parse("a.b.c") === TableRef("a", "b", "c"))
    intercept[IllegalArgumentException](TableRef.parse("a.b"))
    intercept[IllegalArgumentException](TableRef("", "b", "c"))
  }
}
