package graft.text

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hits count distinct shared n-grams; clean docs are absent") {
    val bench = frame(Seq((100L, "the quick brown fox jumps")))
    val docs = frame(Seq(
      (1L, "today the quick brown fox appeared"),   // 'the quick brown', 'quick brown fox'
      (2L, "THE QUICK brown dog sat"),              // case-insensitive 'the quick brown'
      (3L, "completely unrelated words here now"),  // clean
      (4L, "the quick brown fox jumps again")))     // shares 3 distinct 3-grams
    val hits = Decontaminate
      .contaminationHits(docs, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(1L -> 2L, 2L -> 1L, 4L -> 3L))
  }

  test("decontaminated keeps exactly the zero-hit documents") {
    val bench = frame(Seq((100L, "alpha beta gamma")))
    val docs = frame(Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta epsilon zeta eta")))
    val clean = Decontaminate
      .decontaminated(docs, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(clean === Seq(2L))
  }

  test("repeated grams within one doc count once (set semantics)") {
    val bench = frame(Seq((100L, "x y z")))
    val docs = frame(Seq((1L, "x y z and x y z and x y z")))
    val hits = Decontaminate
      .contaminationHits(docs, "doc_id", "text", bench, "text", n = 3)
      .collect()
    assert(hits.length === 1 && hits(0).getLong(1) === 1L)
  }

  test("docs shorter than n grams are never contaminated") {
    val bench = frame(Seq((100L, "a b c d e")))
    val docs = frame(Seq((1L, "a b"), (2L, "")))
    assert(Decontaminate
      .contaminationHits(docs, "doc_id", "text", bench, "text", n = 3)
      .count() === 0)
  }
}
