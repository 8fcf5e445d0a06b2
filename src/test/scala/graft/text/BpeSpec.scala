package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("train learns the hand-computed merge sequence with exact frequencies") {
    import spark.implicits._
    val wc = Seq(("abab", 10L), ("ab", 5L), ("ba", 3L)).toDF("word", "n")
    // pairs: (a,b) 2*10+5=25, (b,a) 10+3=13 → merge1 (a,b)
    // then: (ab,ab) 10, (b,a) 3 → merge2 (ab,ab), merge3 (b,a)
    // then nothing adjacent remains → early stop despite numMerges=5
    val m = Bpe.train(wc, numMerges = 5, minFreq = 2)
    assert(m === Seq(
      Bpe.Merge(1, "a", "b", 25L),
      Bpe.Merge(2, "ab", "ab", 10L),
      Bpe.Merge(3, "b", "a", 3L)))
  }

  test("equal frequencies break ties lexicographically; minFreq stops training") {
    import spark.implicits._
    val wc = Seq(("xy", 2L), ("xz", 2L), ("pq", 1L)).toDF("word", "n")
    val m = Bpe.train(wc, numMerges = 10, minFreq = 2)
    // (x,y) and (x,z) tie at 2 → (x,y) first; (p,q) at 1 < minFreq never learns
    assert(m.map(mm => (mm.left, mm.right, mm.freq)) ===
      Seq(("x", "y", 2L), ("x", "z", 2L)))
  }

  test("merge application is greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a"), "a", "a") ===
      IndexedSeq("aa", "a"))
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a", "a"), "a", "a") ===
      IndexedSeq("aa", "aa"))
    assert(Bpe.applyMerge(IndexedSeq("b", "a", "b"), "a", "b") ===
      IndexedSeq("b", "ab"))
  }

  test("encode replays training merges; token count shrinks as merges grow") {
    import spark.implicits._
    val wc = Seq(("abab", 10L), ("ab", 5L), ("ba", 3L)).toDF("word", "n")
    val merges = Bpe.train(wc, numMerges = 5, minFreq = 2)
    val docs = Seq((1L, "abab ba x"), (2L, "AB aB")).toDF("id", "text")
    val enc = Bpe.encode(docs, "id", "text", merges)
      .as[(Long, Seq[String], Long)].collect()
      .map { case (k, t, n) => k -> ((t, n)) }.toMap
    assert(enc(1L) === ((Seq("abab", "ba", "x"), 3L))) // lowercased words
    assert(enc(2L) === ((Seq("ab", "ab"), 2L)))
    // zero merges = character tokenization
    val plain = Bpe.encode(docs, "id", "text", Nil)
      .as[(Long, Seq[String], Long)].collect()
      .map { case (k, _, n) => k -> n }.toMap
    assert(plain(1L) === 7L) // a b a b b a x
    // a string/UUID id would CAST-to-NULL silently and corrupt every
    // join-back key — encode must refuse it loudly instead
    val badId = Seq(("u-1", "ab")).toDF("id", "text")
    val e = intercept[IllegalArgumentException](
      Bpe.encode(badId, "id", "text", merges))
    assert(e.getMessage.contains("integral id column"))
  }

  test("training is layout-invariant on an organic corpus") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(60)
    val wc = Bpe.wordCounts(docs, "text")
    val a = Bpe.train(wc, numMerges = 8)
    val b = Bpe.train(wc.repartition(7), numMerges = 8)
    assert(a === b)
    assert(a.size === 8) // organic text has plenty of frequent pairs
    // frequencies are positive and every merged symbol is left+right
    a.foreach { m => assert(m.freq > 0) }
  }
}
