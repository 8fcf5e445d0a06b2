package graft

import org.apache.spark.sql.functions._

import graft.catalog.{TableRef, Warehouse}

/** Dev-only SCALE + PARALLELISM witness (test sourceset — never
  * ships): sf0.1's gates are dominated by fixed per-job overhead, so
  * their 8-vs-32-core ratios sit ≈1 and cannot show that the optimized
  * paths parallelize (round-21 verdict, What's wrong #6). This harness
  * runs the write path and the dedup operators over inputs big enough
  * for DATA to dominate, at whatever core count `SPARK_GRAFT_CPUS`
  * names — run it once at 8 and once at 32 and compare the labelled
  * wall times (ratio ≈ cores-bound paths ≫ 1; the driver-side footer
  * stats stay constant and tiny by design).
  *
  * `Test/runMain graft.DevScaleWitness <sfDir> [rows] [docMult]`
  */
object DevScaleWitness {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(
      f"[scalewitness] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rows = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val docMult = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    System.err.println(s"[scalewitness] cpus=$cpus rows=$rows docMult=$docMult")

    // ---- write path: data-dominated commits, footer stats ----------
    val base = java.nio.file.Files.createTempDirectory("graft-scalew").toString
    val wh = new Warehouse(spark, s"$base/wh")
    val ref = TableRef("silver", "scale", "big")
    def synth(n: Long, off: Long) = spark.range(n)
      .select(($"id" + off).as("k"),
        pmod($"id" * 2654435761L, lit(1000000L)).as("g"),
        concat(lit("payload-"), ($"id" % 9973).cast("string")).as("v"))
      .repartition(64)
    val phases0 = graft.util.PhaseTimer.snapshot
    time("overwrite 20M rows, stats(k)") {
      wh.overwrite(ref, synth(rows, 0), statsColumns = Seq("k"))
    }
    time("append 5M rows") {
      wh.append(ref, synth(rows / 4, rows))
    }
    time("deleteWhere (file-pruned)") {
      wh.deleteWhere(ref, $"k" < rows / 64)
    }
    val phases1 = graft.util.PhaseTimer.snapshot
    val delta = phases1.map { case (k, v) =>
      k -> (v - phases0.getOrElse(k, 0.0)) }.filter(_._2 > 0.01)
    System.err.println("[scalewitness] write phases: " +
      delta.toSeq.sortBy(-_._2).map { case (k, v) =>
        f"$k=$v%.2f" }.mkString(" "))
    // what the footer path AVOIDS at this size: an ndv declaration
    // forces the pre-r22 stats scan over the same 20M rows
    val refScan = TableRef("silver", "scale", "big_scanstats")
    time("overwrite 20M rows, ndv-declared (scan stats)") {
      wh.overwrite(refScan, synth(rows, 0), statsColumns = Seq("k"),
        ndvColumns = Seq("k"))
    }
    val phases2 = graft.util.PhaseTimer.snapshot
    System.err.println(f"[scalewitness] scan-stats wh.stats=" +
      f"${phases2.getOrElse("wh.stats", 0.0) - phases1.getOrElse("wh.stats", 0.0)}%.2f " +
      f"(footer path above: ${phases1.getOrElse("wh.stats", 0.0) - phases0.getOrElse("wh.stats", 0.0)}%.2f)")

    // ---- dedup operators: corpus big enough to be compute-bound ----
    // per-replica DISJOINT vocabulary (every token rep-prefixed): the
    // replicas multiply per-row compute 16× without multiplying the
    // shared-shingle posting lists — a shared-vocabulary copy corpus
    // explodes the candidate join quadratically instead of testing
    // parallel scaling of the per-row stages
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = spark.range(docMult).select($"id".as("rep"))
      .crossJoin(docs.select($"doc_id", $"text"))
      .select(($"doc_id" + $"rep" * 1000000L).as("doc_id"),
        regexp_replace($"text", lit("(\\S+)"),
          concat(lit("x"), $"rep", lit("_$1"))).as("text"))
      .localCheckpoint()
    System.err.println(s"[scalewitness] corpus=${corpus.count()}")
    (1 to 2).foreach { pass =>
      time(s"containmentPairs (pass $pass)") {
        graft.dedup.Dedup.containmentPairs(corpus, "doc_id", "text",
          k = 3, threshold = 0.9, maxPostings = 1000).count()
      }
      time(s"minhashCandidates (pass $pass)") {
        graft.dedup.Dedup.minhashCandidates(corpus, "doc_id", "text",
          k = 3, numHashes = 32, bands = 8, threshold = 0.8,
          maxBucket = 1000).count()
      }
    }
    spark.stop()
  }
}
