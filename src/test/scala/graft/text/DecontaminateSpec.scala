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

  test("ratio policy: contained prompts drop their hosts; threshold, short prompts, and the cap hold") {
    import spark.implicits._
    val host = (1 to 40).map(i => s"w$i").mkString(" ")
    val clean = (100 to 130).map(i => s"x$i").mkString(" ")
    val partial = "w10 w11 w12 p1 p2 p3 p4 p5 p6 p7" // one prompt gram only
    val corpus = Seq((1L, host), (2L, clean), (3L, partial))
      .toDF("doc_id", "text")
    val prompts = Seq(
      (100L, (10 to 17).map(i => s"w$i").mkString(" ")), // inside host
      (101L, "too short")                                 // < n tokens: skipped
    ).toDF("eval_id", "text")
    val hits = Decontaminate.promptContainment(corpus, "doc_id", "text",
      prompts, "eval_id", "text", n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    // the 8-token prompt (6 grams) is verbatim inside the host →
    // containment 1.0; `partial` shares ONE of six grams (1/6 < 0.8)
    // and must not hit; the short prompt can't match anything
    assert(hits === Set((1L, 100L, 1.0)))
    val survivors = Decontaminate.decontaminatedByContainment(
        corpus, "doc_id", "text", prompts, "eval_id", "text",
        n = 3, threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors === Seq(2L, 3L))
    // ...and a lower threshold pulls the partial overlap in too
    assert(Decontaminate.decontaminatedByContainment(
        corpus, "doc_id", "text", prompts, "eval_id", "text",
        n = 3, threshold = 0.1)
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
    // corpus-side hot-gram cap: duplicate the host so its grams exceed
    // the cap — matching goes silent for them (contamination MISSED)
    // and the counter says so; at scale non-zero here is the recall
    // warning to check before trusting a clean verdict
    val doubled = corpus.unionByName(Seq((4L, host)).toDF("doc_id", "text"))
    val capped = Decontaminate.promptContainment(doubled, "doc_id", "text",
      prompts, "eval_id", "text", n = 3, threshold = 0.8, maxPostings = 1)
    assert(capped.count() === 0)
    assert(graft.util.CapCounters.get("decontam.dropped_grams")
      .exists(_ > 0L))
  }

  test("semantic policy: paraphrases (scaled vectors) match, orthogonal survive, eval cap counted") {
    import spark.implicits._
    // unit-ish axis vectors: e1-ish rows match eval 100 (scaled copy =
    // same direction), the orthogonal e2 row survives, and a negated
    // copy (cosine -1) survives too — direction matters, not magnitude
    val eval = Seq((100L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("eval_id", "vec")
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f)),   // scaled paraphrase of eval 100
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal — clean
      (3L, Array(-1.0f, 0.0f, 0.0f)),  // negated — cosine -1, clean
      (4L, Array(0.99f, 0.14f, 0.0f))) // near-parallel ~0.99 — hits
      .toDF("doc_id", "vec")
    val hits = Decontaminate.semanticHits(corpus, "doc_id", "vec",
      eval, "eval_id", "vec", threshold = 0.95)
      .select("id", "eval_id").as[(Long, Long)].collect().toSet
    assert(hits === Set((1L, 100L), (4L, 100L)))
    val clean = Decontaminate.decontaminatedSemantic(corpus, "doc_id", "vec",
      eval, "eval_id", "vec", threshold = 0.95)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(2L, 3L))
    // best-match resolution: a row matching TWO evals reports the max-
    // cosine one
    val eval2 = Seq(
      (200L, Array(1.0f, 0.0f, 0.0f)),
      (201L, Array(0.99f, 0.14f, 0.0f)))
      .toDF("eval_id", "vec")
    val best = Decontaminate.semanticHits(
      Seq((9L, Array(0.99f, 0.14f, 0.0f))).toDF("doc_id", "vec"),
      "doc_id", "vec", eval2, "eval_id", "vec", threshold = 0.9)
      .select("eval_id").as[Long].collect().toSeq
    assert(best === Seq(201L), "the exact-direction eval must win the argmax")
    // eval cap: overflow is COUNTED, never silent
    graft.util.CapCounters.reset()
    Decontaminate.semanticHits(corpus, "doc_id", "vec",
      eval2, "eval_id", "vec", threshold = 0.95, maxEval = 1).count()
    assert(graft.util.CapCounters.get("decontam.dropped_evals")
      .contains(1L))
  }

  test("semantic policy at maxEval=1024 whole-stage codegens (no interpreted fallback) and matches brute force") {
    import spark.implicits._
    // deterministic pseudo-vectors, dim 8
    def vec(seed: Long): Array[Float] =
      Array.tabulate(8)(i => (((seed * 31 + i * 7 + 3) % 17) - 8).toFloat)
    val evals = (0L until 1024L).map(e => (e, vec(e))).toDF("eval_id", "vec")
    // a REAL file scan: a local relation would constant-fold the whole
    // projection on the driver and leave nothing to codegen-assert
    val corpusDir = tmpDir("decontam-codegen")
    (0L until 64L).map(c => (c, vec(c * 13 + 5))).toDF("doc_id", "vec")
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val expected = (0L until 64L).flatMap { c =>
      val cv = vec(c * 13 + 5)
      val best = (0L until 1024L).map(e => (cos(cv, vec(e)), e)).max
      if (best._1 >= 0.9) Some((c, best._2)) else None
    }.toSet
    // fallback=false: a Janino compile failure (the un-blocked 1024-way
    // unfold blew the method-size limit and silently interpreted)
    // becomes a loud exception here
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val hits = Decontaminate.semanticHits(corpus, "doc_id", "vec",
        evals, "eval_id", "vec", threshold = 0.9, maxEval = 1024)
      // the scoring projections sit INSIDE whole-stage codegen spans
      val exec = hits.queryExecution.executedPlan
      val wscg = exec.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(wscg.nonEmpty, s"no WholeStageCodegen span in:\n$exec")
      // codegen'd operators print as "*(n) Project"; a bare "Project"
      // line is an interpreted fallback of the scoring stage
      val bare = exec.toString.linesIterator
        .filter(_.matches("""[\s+:-]*Project .*""")).toSeq
      assert(bare.isEmpty,
        s"scoring Project fell outside whole-stage codegen:\n$exec")
      val got = hits.select("id", "eval_id").as[(Long, Long)].collect().toSet
      assert(got === expected)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("eval truncation is ordered (deterministic) and null eval rows are refused") {
    import spark.implicits._
    // three evals across three partitions in scrambled order: maxEval=2
    // must screen ids {1,2} — the ORDERED prefix — every run
    val evals = Seq(
      (3L, Array(0.0f, 0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("eval_id", "vec").repartition(3)
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),  // matches eval 1 (kept)
      (30L, Array(0.0f, 0.0f, 1.0f)))  // matches only eval 3 (dropped)
      .toDF("doc_id", "vec")
    (1 to 3).foreach { _ =>
      val hits = Decontaminate.semanticHits(corpus, "doc_id", "vec",
        evals, "eval_id", "vec", threshold = 0.95, maxEval = 2)
        .select("id", "eval_id").as[(Long, Long)].collect().toSet
      assert(hits === Set((10L, 1L)),
        "truncation must keep the ordered eval prefix {1,2}")
    }
    val nullEval = Seq((null.asInstanceOf[java.lang.Long], Array(1.0f, 0.0f, 0.0f)))
      .toDF("eval_id", "vec")
    val e = intercept[IllegalArgumentException] {
      Decontaminate.semanticHits(corpus, "doc_id", "vec",
        nullEval, "eval_id", "vec", threshold = 0.9)
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("drop plans carry no corpus-derived broadcast hint (AQE decides)") {
    import spark.implicits._
    val eval = Seq((1L, Array(1.0f, 0.0f))).toDF("eval_id", "vec")
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("doc_id", "vec")
    val sem = Decontaminate.decontaminatedSemantic(corpus, "doc_id", "vec",
      eval, "eval_id", "vec", threshold = 0.9)
    val prompts = Seq((1L, "a b c d")).toDF("p_id", "text")
    val docs = Seq((1L, "a b c d e"), (2L, "x y z w q")).toDF("doc_id", "text")
    val cont = Decontaminate.decontaminatedByContainment(docs, "doc_id",
      "text", prompts, "p_id", "text", n = 3, threshold = 0.5)
    // the anti-join's right side (the corpus-derived contaminated-id
    // set) must carry no broadcast hint; promptContainment's inner
    // broadcast of the PROMPT side (bounded by the eval suite) is fine
    Seq(sem, cont).foreach { df =>
      import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
      import org.apache.spark.sql.catalyst.plans.LeftAnti
      val antiRights = df.queryExecution.analyzed.collect {
        case j: Join if j.joinType == LeftAnti => j.right
      }
      assert(antiRights.nonEmpty)
      antiRights.foreach { r =>
        assert(!r.isInstanceOf[ResolvedHint],
          s"corpus-derived anti-join side must not be hint-broadcast:\n$r")
      }
    }
    // values unchanged by the hint removal
    assert(sem.select("doc_id").as[Long].collect().toSet === Set(2L))
    assert(cont.select("doc_id").as[Long].collect().toSet === Set(2L))
  }
}
