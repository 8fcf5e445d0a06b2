package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.{Shingles, TextFunctions}

/** Dev-only SCALE witness for the minhash incremental-dedup verify
  * (test sourceset — never ships): at gate scale (sf0.1, 5k docs) the
  * candidate-pruned verify and the full-corpus re-shingle verify are
  * within noise of each other, which cannot distinguish the two
  * designs; this harness grows the KEPT corpus by `mult` (the regime an
  * incremental pipeline actually runs in — a big standing corpus, a
  * small daily batch) and times:
  *
  *   pruned:  kept semi-joined on candidate ids BEFORE the shingle
  *            compute (the r22 shape)
  *   full:    every kept row re-tokenized + re-shingled as verify
  *            input (the r21 shape, inlined here)
  *
  * Both produce identical pairs (asserted). Run with
  * `Test/runMain graft.DevDedupScale <sfDir> [mult] [batchRows]`.
  * Second timing per form reported (first pass pays codegen).
  */
object DevDedupScale {
  private def time[A](label: String)(f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[dedupscale] $label%-34s $s%8.2fs")
    (r, s)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(20)
    val batchRows = args.lift(2).map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = Tables.load(spark, sfDir, "documents")
    // kept corpus: `mult` disjoint-id copies with per-copy text salt so
    // copies are near- but not exact-dups across replicas (realistic
    // vocabulary overlap keeps the LSH buckets shared)
    val kept = spark.range(mult).select($"id".as("rep"))
      .crossJoin(docs.select($"doc_id", $"text"))
      .select(($"doc_id" + $"rep" * 1000000L).as("doc_id"),
        concat($"text", lit(" rep"), $"rep").as("text"))
      .repartition(64)
      .localCheckpoint()
    val keptN = kept.count()
    // daily batch: re-crawls of kept docs (near-dup hits) + novel rows
    val batch = docs.filter($"doc_id" % (5000 / batchRows) === 0)
      .select(($"doc_id" + 50000000L).as("doc_id"),
        concat($"text", lit(" zymurgy")).as("text"))
      .localCheckpoint()
    val batchN = batch.count()
    // the persisted state an incremental pipeline keeps (production
    // reads it from a bucketed table; the checkpoint is the analogue)
    val keptBands = Dedup.minhashBandTable(kept, "doc_id", "text", 3, 32, 8)
      .localCheckpoint()
    System.err.println(s"[dedupscale] kept=$keptN batch=$batchN " +
      s"bands=${keptBands.count()} cpus=$cpus")

    def pruned(): DataFrame =
      Dedup.minhashCandidatesAgainst(batch, kept, keptBands,
        "doc_id", "text", 3, 32, 8, 0.5, 1000)

    // the r21 shape, inlined: full-corpus shingles as verify input
    def full(): DataFrame = {
      val batchBands = Dedup.minhashBandTable(batch, "doc_id", "text", 3, 32, 8)
      val widths = batchBands.select("band", "bucket")
        .union(keptBands.select("band", "bucket"))
        .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1 && col("n") <= 1000)
        .localCheckpoint()
      val bb = batchBands.join(widths, Seq("band", "bucket"), "left_semi")
      val kb = keptBands.join(widths, Seq("band", "bucket"), "left_semi")
      val cands = bb.as("l").join(kb.as("r"),
          col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket"))
        .select(col("l.id").as("batch_id"), col("r.id").as("kept_id"))
        .distinct()
      def sh(df: DataFrame, idAs: String, shAs: String) = df
        .select(col("doc_id"), col("text")).repartition(64)
        .select(col("doc_id").as(idAs),
          transform(Shingles.shingles(TextFunctions.tokens(col("text")), 3),
            s => xxhash64(s)).as(shAs))
      cands
        .join(sh(batch, "batch_id", "__sh_b"), "batch_id")
        .join(sh(kept, "kept_id", "__sh_k"), "kept_id")
        .withColumn("jaccard",
          round(Dedup.jaccard(col("__sh_b"), col("__sh_k")), 6))
        .filter(col("jaccard") >= 0.5)
        .select("batch_id", "kept_id", "jaccard")
    }

    def rows(df: DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    var prunedSet: Set[(Long, Long, Double)] = null
    var fullSet: Set[(Long, Long, Double)] = null
    (1 to 2).foreach { pass =>
      val (p, _) = time(s"pruned verify (pass $pass)") { rows(pruned()) }
      val (f, _) = time(s"full-reshingle verify (pass $pass)") { rows(full()) }
      prunedSet = p; fullSet = f
    }
    assert(prunedSet == fullSet,
      s"pair sets diverged: pruned=${prunedSet.size} full=${fullSet.size}")
    System.err.println(s"[dedupscale] identical pairs: ${prunedSet.size}")
    spark.stop()
  }
}
