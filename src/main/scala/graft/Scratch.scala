package graft

/** Temporary profiling harness — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    import org.apache.spark.sql.functions._
    import graft.dedup.Dedup
    import graft.text.{Shingles, TextFunctions}
    val docs = Tables.load(spark, dir, "documents")
    docs.count()
    val toks = TextFunctions.tokens(col("text"))
    time("signatures only")(docs.select(
      Dedup.minhashSignature(toks, 3, 64).as("sig")).count())
    time("shingles only (HOF)")(docs.select(
      Shingles.shingles(toks, 3).as("sh")).select(sum(size(col("sh")))).collect())
    time("shingles+jaccard self")(docs.select(col("doc_id"), Shingles.shingles(toks, 3).as("sh"))
      .withColumn("j", Dedup.jaccard(col("sh"), col("sh"))).select(sum(col("j"))).collect())
    val pairsPlan = Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 3, numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 200)
    val pairs = time("minhashCandidates")(pairsPlan.localCheckpoint())
    System.err.println(s"[scratch] pairs=${pairs.count()}")
    val groups = time("dupGroups")(Dedup.dupGroups(pairs, maxIters = 4))
    time("keepCanonical")(
      Dedup.keepCanonical(docs, "doc_id", groups).count())
    // second run of the full thing, warm
    time("full e2e (warm)") {
      val p = Dedup.minhashCandidates(docs, "doc_id", "text",
        k = 3, numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 200)
      Dedup.keepCanonical(docs, "doc_id", Dedup.dupGroups(p, maxIters = 4)).count()
    }
    spark.stop()
  }
}
