package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),  // close to 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.95f, 0.05f, 0.0f)), // close to 2
      (4L, Seq(0.0f, 0.0f, 1.0f, 1.0f)),
      (5L, Seq(0.0f, 0.0f, 0.0f, 0.0f))   // zero vector
    ).toDF("vec_id", "embedding")
  }

  test("cosine: orthogonal=0, identical=1, zero-vector safe") {
    import spark.implicits._
    val out = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
      .as[Double].collect().toSeq
    assert(out(0) === 0.0)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(out(2) === 0.0)
  }

  test("brute-force top-k returns ranked nearest neighbors") {
    import spark.implicits._
    val queries = vecs.filter($"vec_id".isin(0L, 2L))
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 2)
      .select("query_id", "rank", "id")
      .as[(Long, Int, Long)].collect().toSet
    assert(out === Set((0L, 1, 0L), (0L, 2, 1L), (2L, 1, 2L), (2L, 2, 3L)))
  }

  test("IVF: centroids sampled, assignment total, probe search matches brute force top-1") {
    import spark.implicits._
    val corpus = vecs.filter($"vec_id" =!= 5L)
    val centroids = Similarity.sampleCentroids(corpus, "vec_id", "embedding", nlist = 3)
    assert(centroids.count() <= 3 && centroids.count() > 0)
    val assigned = Similarity.assign(corpus, "vec_id", "embedding", centroids)
    assert(assigned.count() === corpus.count()) // every row lands somewhere
    assert(assigned.columns.contains("cid"))

    val queries = Seq((100L, Seq(0.95f, 0.05f, 0.0f, 0.0f)))
      .toDF("query_id", "qvec")
    val ivf = Similarity.ivfTopK(assigned, "vec_id", "embedding", centroids,
        queries, "query_id", "qvec", k = 1, nprobe = 3)
      .select("id").as[Long].collect().toSeq
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 1)
      .select("id").as[Long].collect().toSeq
    assert(ivf === bf) // nprobe=nlist → exhaustive, must agree exactly
  }

  test("LSH-bucketed top-k: self-match first, near vectors found, exactly-once") {
    import spark.implicits._
    val queries = vecs.filter($"vec_id".isin(0L, 2L))
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val out = Similarity.lshTopK(vecs, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 2, planes = 12, bands = 6, dim = 4)
      .select("query_id", "rank", "id").as[(Long, Int, Long)].collect().toSeq
    // exactly-once per (query, id) despite multi-band collisions
    assert(out.map(r => (r._1, r._3)).distinct.size === out.size)
    // each query finds ITSELF at rank 1 (identical sign bits in every band)
    assert(out.contains((0L, 1, 0L)))
    assert(out.contains((2L, 1, 2L)))
    // and its near neighbor next (mirrors the brute-force expectation)
    assert(out.contains((0L, 2, 1L)))
    assert(out.contains((2L, 2, 3L)))
  }

  test("sign-LSH near-dups find close pairs, skip orthogonal ones") {
    import spark.implicits._
    val out = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
        threshold = 0.9, planes = 12, bands = 3, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)))
    assert(out.contains((2L, 3L)))
    assert(!out.exists { case (a, b) => Set(a, b) === Set(0L, 2L) })
  }

  test("sign-LSH candidate cap keeps an all-zero block linear") {
    import spark.implicits._
    // 60 all-zero vectors: dot >= 0 on every hyperplane → identical
    // all-ones bits in EVERY band. Uncapped they alone expand to
    // 60*59/2 = 1770 candidate pairs per band; the cap must drop the
    // degenerate bucket while the genuine near-dup pair survives.
    val zeros = (100L until 160L).map(i => (i, Seq.fill(4)(0.0f)))
    val real = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)))
    val df = (real ++ zeros).toDF("vec_id", "embedding")
    val cands = Similarity.signBandCandidates(df, "vec_id", "embedding",
      planes = 12, bands = 3, dim = 4, maxBucket = 20)
      .as[(Long, Long)].collect().toSet
    // no quadratic zero×zero blow-up survives the cap
    assert(!cands.exists { case (a, b) => a >= 100L && b >= 100L })
    assert(cands.contains((0L, 1L)))
    // ...and the drop is OBSERVABLE: the degenerate zero-bucket(s) the
    // cap silenced are counted, not silent (graft.util.CapCounters)
    assert(graft.util.CapCounters.get("embed_lsh.dropped_buckets")
      .exists(_ > 0L))
    // and the end-to-end operator still finds the real pair only
    val out = Similarity.cosineNearDups(df, "vec_id", "embedding",
        threshold = 0.9, planes = 12, bands = 3, dim = 4, maxBucket = 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((0L, 1L)))
  }

  test("incremental near-dup finds batch×kept pairs through the persisted band table") {
    import spark.implicits._
    val kept = vecs.filter($"vec_id" =!= 5L)
    val keptBands = Similarity.signBandTable(kept, "vec_id", "embedding",
      planes = 12, bands = 3, dim = 4)
    val batch = Seq(
      (20L, Seq(0.95f, 0.05f, 0.0f, 0.0f)), // near dup of kept 0 (and 1)
      (21L, Seq(-1.0f, -1.0f, 1.0f, -1.0f)) // unrelated direction
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupsAgainst(batch, kept, keptBands,
        "vec_id", "embedding", threshold = 0.9, planes = 12, bands = 3, dim = 4)
      .select("batch_id", "kept_id").as[(Long, Long)].collect().toSet
    assert(out.contains((20L, 0L)))
    assert(!out.exists(_._1 == 21L))
    // batch-only: the kept corpus never pairs with itself here
    assert(out.forall(_._1 >= 20L))
  }

  test("kmeans step recomputes centroids as member means and keeps assignment total") {
    import spark.implicits._
    // two obvious clusters around e1 and e2
    val corpus = Seq(
      (0L, Seq(1.0f, 0.1f)), (1L, Seq(0.9f, 0.0f)), (2L, Seq(1.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.1f, 0.9f)), (5L, Seq(0.0f, 1.1f)))
      .toDF("vec_id", "embedding")
    val refined = Similarity.kmeansCentroids(corpus, "vec_id", "embedding",
      nlist = 2, iters = 2)
    assert(refined.count() === 2)
    val cents = refined.select("centroid").as[Seq[Float]].collect()
    // each refined centroid points clearly at one cluster axis
    assert(cents.exists(c => c(0) > 2 * c(1)))
    assert(cents.exists(c => c(1) > 2 * c(0)))
    // assignment over refined centroids is total and splits the corpus
    val assigned = Similarity.assign(corpus, "vec_id", "embedding", refined)
    assert(assigned.count() === 6)
    val sizes = assigned.groupBy("cid").count().as[(Int, Long)].collect().toMap
    assert(sizes.values.toSeq.sorted === Seq(3L, 3L))
  }

  test("hyperplanes are deterministic") {
    assert(Similarity.hyperplanes(4, 8) === Similarity.hyperplanes(4, 8))
    assert(Similarity.hyperplanes(4, 8).flatten.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("semDedupPairs = brute-force pairs restricted to co-clustered rows") {
    import spark.implicits._
    val corpus = vecs.filter($"vec_id" =!= 5L)
    val cents = Seq(
      (0, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (2, Seq(0.0f, 0.0f, 1.0f, 1.0f))).toDF("cid", "centroid")
    val got = Similarity.semDedupPairs(corpus, "vec_id", "embedding",
        cents, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force ≥0.9 pairs among co-clustered rows: (0,1) share c0,
    // (2,3) share c1; 4 is alone in c2
    assert(got === Set((0L, 1L), (2L, 3L)))
  }

  test("semDedupPairs: clusters wider than maxCluster generate no pairs") {
    import spark.implicits._
    val corpus = vecs.filter($"vec_id" =!= 5L)
    val oneCluster = Seq((0, Seq(1.0f, 1.0f, 1.0f, 1.0f))).toDF("cid", "centroid")
    val capped = Similarity.semDedupPairs(corpus, "vec_id", "embedding",
      oneCluster, threshold = 0.0, maxCluster = 3)
    assert(capped.count() === 0) // all 5 rows in one cluster > cap
    val uncapped = Similarity.semDedupPairs(corpus, "vec_id", "embedding",
      oneCluster, threshold = 0.0, maxCluster = 5)
    assert(uncapped.count() === 10) // 5 choose 2
  }

  test("semDedup keeps the group member FARTHEST from its centroid, ties to lowest id") {
    import spark.implicits._
    // one cluster around e1: ids 0 and 1 are near-dups of each other;
    // id 1 sits farther from the centroid (lower csim) and must win
    // despite its higher id. ids 7 and 8 are exact duplicates (csim
    // ties bit-for-bit) → lowest id 7 wins. id 4 pairs with nobody.
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),    // csim = 1 to c0
      (1L, Seq(0.98f, 0.15f, 0.0f, 0.0f)),  // ~0.988 to c0, cos(0,1) ~0.988
      (7L, Seq(0.0f, 0.0f, 1.0f, 1.0f)),
      (8L, Seq(0.0f, 0.0f, 1.0f, 1.0f)),    // exact dup of 7
      (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f))     // alone above threshold
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (0, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1, Seq(0.0f, 0.0f, 1.0f, 1.0f)),
      (2, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("cid", "centroid")
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
        cents, threshold = 0.95)
      .select("vec_id", "cid").as[(Long, Int)].collect().toSet
    assert(out === Set((1L, 0), (7L, 1), (4L, 2)))
  }
}
