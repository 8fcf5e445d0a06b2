package graft.text

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("corpus-duplicated lines are stripped, unique lines keep order") {
    val in = docs(
      1L -> "intro one\nBOILER\nbody a\nfooter",
      2L -> "BOILER\nbody b\nfooter",
      3L -> "only unique\nlines here")
    val out = LineDedup.stripDuplicatedLines(in, "id", "text")
      .orderBy("id").collect()
    // BOILER (x2) and footer (x2) exceed maxOccurrences=1 everywhere
    assert(out.map(r => r.getAs[String]("clean_text")).toSeq === Seq(
      "intro one\nbody a", "body b", "only unique\nlines here"))
    assert(out.map(r => r.getAs[Long]("lines_kept")).toSeq === Seq(2L, 1L, 2L))
    // original columns pass through
    assert(out.head.getAs[String]("text").startsWith("intro one"))
  }

  test("within-doc repetition counts with multiplicity") {
    val in = docs(1L -> "same\nsame\nother")
    val out = LineDedup.stripDuplicatedLines(in, "id", "text").collect()
    assert(out.head.getAs[String]("clean_text") === "other")
  }

  test("fully-boilerplate docs come back empty, not dropped") {
    val in = docs(1L -> "x\nx", 2L -> "keep me")
    val out = LineDedup.stripDuplicatedLines(in, "id", "text")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq === Seq("", "keep me"))
    assert(out.map(_.getAs[Long]("lines_kept")).toSeq === Seq(0L, 1L))
  }

  test("maxOccurrences loosens the threshold") {
    val in = docs(1L -> "twice", 2L -> "twice", 3L -> "solo")
    val out = LineDedup.stripDuplicatedLines(in, "id", "text", maxOccurrences = 2)
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq ===
      Seq("twice", "twice", "solo"))
  }

  test("reserved column names fail loudly") {
    import org.apache.spark.sql.functions.lit
    val in = docs(1L -> "a").withColumn("lines_kept", lit(0L))
    val e = intercept[IllegalArgumentException] {
      LineDedup.stripDuplicatedLines(in, "id", "text")
    }
    assert(e.getMessage.contains("lines_kept"))
  }
}
