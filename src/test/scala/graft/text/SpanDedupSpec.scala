package graft.text

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  private def spans(in: org.apache.spark.sql.DataFrame, n: Int) = {
    import in.sparkSession.implicits._
    SpanDedup.duplicatedSpans(in, "id", "text", n)
      .as[(Long, Long, Long)].collect().toSet
  }

  test("a shared phrase yields one merged span in each doc, unique text none") {
    // docs 1 and 2 share the 4-token phrase at different offsets;
    // its two 3-grams overlap and must merge to one [start, start+4) span
    val in = docs(
      1L -> "u1 u2 common alpha beta gamma u3",
      2L -> "v1 common alpha beta gamma",
      3L -> "all tokens here are unique ones")
    assert(spans(in, 3) === Set((1L, 2L, 6L), (2L, 1L, 5L)))
  }

  test("within-doc repetition alone is NOT a cross-doc span") {
    val in = docs(
      1L -> "echo echo echo echo echo echo",
      2L -> "totally different words appear here")
    assert(spans(in, 3) === Set.empty)
  }

  test("identical docs flag end-to-end spans; under-n docs never crash") {
    val in = docs(
      1L -> "one two three four five",
      2L -> "one two three four five",
      3L -> "ab") // shorter than n: no grams, no downward sequence
    assert(spans(in, 4) === Set((1L, 0L, 5L), (2L, 0L, 5L)))
  }

  test("disjoint duplicated phrases stay separate spans when gap > n") {
    // shared 3-grams at positions 0 and 8 in doc 1: gap 8 > 3 → two spans
    val in = docs(
      1L -> "p q r x1 x2 x3 x4 x5 s t u",
      2L -> "p q r",
      3L -> "s t u")
    assert(spans(in, 3) === Set((1L, 0L, 3L), (1L, 8L, 11L),
      (2L, 0L, 3L), (3L, 0L, 3L)))
  }

  test("incremental: batch flags against the persisted model AND itself; counts merge") {
    import spark.implicits._
    val kept = docs(1L -> "license header text here plus unique tail")
    val batch = docs(
      2L -> "fresh words then license header text here", // dup vs MODEL only
      3L -> "twin payload alpha beta gamma",             // dup WITHIN batch
      4L -> "twin payload alpha beta gamma",
      5L -> "nothing shared with anybody at all")
    val model = SpanDedup.gramDocCounts(kept, "id", "text", n = 3)
    val (s, updated) = SpanDedup.duplicatedSpansAgainst(batch, model, "id", "text", n = 3)
    val got = s.as[(Long, Long, Long)].collect().toSet
    // doc 2: "license header text here" at positions 3..6 (grams 3,4)
    // docs 3,4: identical 5-token docs → full span [0, 5)
    assert(got === Set((2L, 3L, 7L), (3L, 0L, 5L), (4L, 0L, 5L)))
    // the incremental result equals the one-pass rule restricted to batch
    val onePass = SpanDedup.duplicatedSpans(kept.unionByName(batch), "id", "text", 3)
      .filter($"id" =!= 1L).as[(Long, Long, Long)].collect().toSet
    assert(got === onePass)
    // merged model: a gram seen in kept AND doc 2 now counts 2 docs
    val m = updated.select($"gram_hash", $"n_docs").as[(Long, Long)].collect().toMap
    val h = SpanDedup.gramDocCounts(
      docs(9L -> "license header text here"), "id", "text", 3)
      .select("gram_hash").as[Long].collect()
    h.foreach(g => assert(m(g) === 2L))
  }

  test("bigram LM: hand-derived Laplace micro-nat scores; self-trained corpus") {
    import spark.implicits._
    val in = docs(1L -> "a b a b", 2L -> "a c")
    // contexts: a→3 bigrams, b→1; V=3; p(b|a)=(2+1)/(3+3), p(a|b)=(1+1)/(1+3),
    // p(c|a)=(1+1)/(3+3)
    val out = NgramLm.bigramScore(in, in, "id", "text")
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    def unats(p: Double) = math.rint(math.log(p) * 1e6).toLong
    assert(out(1L) === ((3L, 2 * unats(0.5) + unats(0.5))))
    assert(out(2L) === ((1L, unats(2.0 / 6.0))))
    // scoring a corpus with UNSEEN tokens backs off to the Laplace floor
    val unseen = docs(9L -> "z q")
    val s9 = NgramLm.bigramScore(in, unseen, "id", "text")
      .as[(Long, Long, Long)].collect()
    assert(s9.toSeq === Seq((9L, 1L, unats(1.0 / 3.0))))
    // under-2-token docs emit no row
    assert(NgramLm.bigramScore(in, docs(5L -> "solo"), "id", "text").count() === 0L)
  }

  test("removeSpans strips flagged tokens, leaves clean docs verbatim-tokenized") {
    import spark.implicits._
    val in = docs(
      1L -> "u1 u2 common alpha beta gamma u3",
      2L -> "v1 common alpha beta gamma",
      3L -> "untouched   text")
    val s = SpanDedup.duplicatedSpans(in, "id", "text", 3)
    val out = SpanDedup.removeSpans(in, "id", "text", s)
      .select("id", "text").as[(Long, String)].collect().toMap
    assert(out(1L) === "u1 u2 u3")
    assert(out(2L) === "v1")
    assert(out(3L) === "untouched text")
  }
}
