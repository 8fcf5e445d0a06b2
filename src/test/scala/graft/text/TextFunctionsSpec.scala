package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  private def eval1[T](text: String, c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("out")).collect()(0).getAs[T]("out")
  }

  test("tokens and counts handle empties and runs of whitespace") {
    assert(eval1[Int]("a  b\t c", TextFunctions.tokenCount(col("t"))) === 3)
    assert(eval1[Int]("", TextFunctions.tokenCount(col("t"))) === 0)
    assert(eval1[Int]("   ", TextFunctions.tokenCount(col("t"))) === 0)
  }

  test("bpe-ish token count: ~len/4 per word plus punctuation") {
    // "hello world!" → ceil(5/4)+ceil(6/4)=2+2 pieces... world! is one
    // whitespace token of length 6 → 2; plus 1 punct char
    assert(eval1[Long]("hello world!", TextFunctions.bpeTokenCountApprox(col("t"))) === 5L)
  }

  test("punct and stopword ratios") {
    assert(eval1[Double]("a, b.", TextFunctions.punctRatio(col("t"))) === 2.0 / 5)
    assert(eval1[Double]("the cat sat", TextFunctions.stopwordRatio(col("t"), Stopwords.english))
      === 1.0 / 3)
    assert(eval1[Double]("", TextFunctions.stopwordRatio(col("t"), Stopwords.english)) === 0.0)
  }

  test("langId separates languages and falls back to und") {
    assert(eval1[String]("the quick fox jumps over the lazy dog and it is fast",
      TextFunctions.langId(col("t"))) === "en")
    assert(eval1[String]("el gato que está en la casa es muy bonito y los perros",
      TextFunctions.langId(col("t"))) === "es")
    assert(eval1[String]("der Hund und die Katze sind nicht im Haus mit dem Mann",
      TextFunctions.langId(col("t"))) === "de")
    assert(eval1[String]("zzz qqq xxx", TextFunctions.langId(col("t"))) === "und")
  }

  test("quality score rewards normal prose, punishes degenerate text") {
    val prose = "the quick brown fox jumps over the lazy dog and runs away to the forest"
    val junk = "!!! ??? *** ### !!!"
    val good = eval1[Double](prose, TextFunctions.qualityScore(col("t")))
    val bad = eval1[Double](junk, TextFunctions.qualityScore(col("t")))
    assert(good === 1.0)
    assert(bad < 0.5)
  }

  test("fingerprint is whitespace/case insensitive, content sensitive") {
    import spark.implicits._
    val fps = Seq("Hello  World", "hello world", "hello worlds")
      .toDF("t").select(TextFunctions.fingerprint(col("t")).as("f"))
      .as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("repetition profile: dup fractions and top-token mode") {
    val c = col("t")
    // 4 tokens, 2 distinct → dup_token_frac = 0.5
    assert(eval1[Double]("a b a b", TextFunctions.dupTokenFrac(c)) === 0.5)
    assert(eval1[Double]("a b c d", TextFunctions.dupTokenFrac(c)) === 0.0)
    assert(eval1[Double]("", TextFunctions.dupTokenFrac(c)) === 0.0)
    // "x" appears 3 of 5 tokens → 0.6, regardless of position
    assert(eval1[Double]("x y x z x", TextFunctions.topTokenFrac(c)) === 0.6)
    assert(eval1[Double]("only", TextFunctions.topTokenFrac(c)) === 1.0)
    assert(eval1[Double]("", TextFunctions.topTokenFrac(c)) === 0.0)
    // 3 non-empty lines, one repeated; blank lines don't count
    assert(eval1[Double]("foo\nbar\n\n  \nfoo", TextFunctions.dupLineFrac(c))
      === 1.0 - 2.0 / 3.0)
  }

  test("pii redaction masks emails, ips, phones; counts audit the raw text") {
    val c = col("t")
    assert(eval1[String]("mail bob.smith+x@corp.example.org now",
      TextFunctions.redactPii(c)) === "mail <EMAIL> now")
    assert(eval1[String]("host 192.168.0.1 up", TextFunctions.redactPii(c))
      === "host <IP> up")
    assert(eval1[String]("call 555-867-5309 or 555.867.5309",
      TextFunctions.redactPii(c)) === "call <PHONE> or <PHONE>")
    // email wins over the dotted quad embedded in its domain
    assert(eval1[String]("x a@1.2.3.4.com y", TextFunctions.redactPii(c))
      === "x <EMAIL> y")
    // versions / decimals with word chars attached don't false-positive
    assert(eval1[String]("v1.2.3.4beta stays", TextFunctions.redactPii(c))
      === "v1.2.3.4beta stays")
    val (e, i, p) = TextFunctions.piiCounts(c)
    assert(eval1[Int]("a@b.co c@d.io 10.0.0.1", e) === 2)
    assert(eval1[Int]("a@b.co c@d.io 10.0.0.1", i) === 1)
    assert(eval1[Int]("no pii here", p) === 0)
  }

  test("tfidf: rare tokens outweigh common ones, counts exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat dog"),
      (2L, "cat fish"),
      (3L, "cat")).toDF("id", "text")
    val rows = TfIdf.tfidf(docs, "id", "text", 3L)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(rows((1L, "cat"))._1 === 2L) // tf counts multiplicity
    assert(rows((1L, "cat"))._2 === 3L) // df counts documents, not occurrences
    assert(rows((2L, "fish"))._2 === 1L)
    // idf("cat") = ln(4/4)+1 = 1; idf("fish") = ln(4/2)+1
    assert(rows((3L, "cat"))._3 === 1.0)
    assert(rows((2L, "fish"))._3 === math.rint((math.log(2.0) + 1) * 1e6) / 1e6)
    // a doc's rare token outweighs its common one
    assert(rows((2L, "fish"))._3 > rows((2L, "cat"))._3)
  }

  test("bm25: matches the hand-derived Okapi formula, rare terms score higher") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a c")).toDF("id", "text")
    val rows = TfIdf.bm25(docs, "id", "text", 2L)
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    // doc 1 "a": tf=2 df=2 dl=3, avgdl=2.5
    val (k1, b) = (1.2, 0.75)
    def score(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log(1.0 + (2.0 - df + 0.5) / (df + 0.5))
      val v = idf * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * dl / 2.5))
      math.rint(v * 1e6) / 1e6
    }
    assert(rows((1L, "a")) === ((2L, 2L, 3L, score(2, 2, 3))))
    assert(rows((1L, "b")) === ((1L, 1L, 3L, score(1, 1, 3))))
    assert(rows((2L, "c")) === ((1L, 1L, 2L, score(1, 1, 2))))
    // the rare term outscores the ubiquitous one within a doc
    assert(rows((2L, "c"))._4 > rows((2L, "a"))._4)
  }

  test("shingles: distinct k-grams, empty under k tokens") {
    import spark.implicits._
    val sh = Seq("a b c d", "a b", "a b a b a b")
      .toDF("t")
      .select(Shingles.shingles(TextFunctions.tokens(col("t")), 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0) === Seq("a b c", "b c d"))
    assert(sh(1) === Seq.empty)
    assert(sh(2) === Seq("a b a", "b a b")) // distinct
  }
}
