package graft

import java.sql.Timestamp
import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.meta.TableMeta
import graft.quality.Checker
import graft.sinks.Merge
import graft.sql.QualifyRewrite

/** Property-style invariants over seeded random inputs (SURVEY.md §5
  * test strategy #3). Deterministic seeds — failures reproduce exactly.
  */
class PropertiesSpec extends SparkSpec {

  private def randomBatch(rnd: Random, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { _ =>
      val key = s"k${rnd.nextInt(8)}"
      val ts = new Timestamp(1700000000000L + rnd.nextInt(1000) * 3600000L)
      (key, ts, rnd.nextInt(100).toDouble)
    }.toDF("k", "t", "v")
  }

  private def latestPerKey(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("t").desc, col("v").desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def multiset(df: DataFrame) =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("merge idempotence: merge(merge(T,B),B) == merge(T,B) for deduped batches") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val target = latestPerKey(randomBatch(rnd, 12))
      val batch = latestPerKey(randomBatch(rnd, 12))
      val once = Merge.merge(target, batch, Seq("k"), Some("t"))
      val twice = Merge.merge(once, batch, Seq("k"), Some("t"))
      assert(multiset(once) === multiset(twice), s"seed=$seed")
    }
  }

  test("merge conservation: every target key survives; every batch key present") {
    import spark.implicits._
    for (seed <- 10 to 13) {
      val rnd = new Random(seed)
      val target = latestPerKey(randomBatch(rnd, 10))
      val batch = latestPerKey(randomBatch(rnd, 10))
      val merged = Merge.merge(target, batch, Seq("k"), Some("t"))
      val mergedKeys = merged.select("k").as[String].collect().toSet
      val inputKeys = (target.select("k").as[String].collect() ++
        batch.select("k").as[String].collect()).toSet
      assert(mergedKeys === inputKeys, s"seed=$seed")
    }
  }

  private val checkerYaml =
    """schema:
      |  - name: 'id'
      |    type: 'string'
      |    mandate: 'global_required'
      |    key: true
      |    tests:
      |      - test_type: missing
      |      - test_type: duplicated
      |  - name: 'v'
      |    type: 'double'
      |    mandate: 'local_required'
      |    tests:
      |      - test_type: type_mismatch
      |""".stripMargin

  test("checker invariants: |result| = rows × tests; score ∈ {0,1} consistent with verdict") {
    import spark.implicits._
    for (seed <- 20 to 22) {
      val rnd = new Random(seed)
      val rows = (0 until 20).map { _ =>
        val id = if (rnd.nextInt(5) == 0) "" else s"id${rnd.nextInt(10)}"
        val v = if (rnd.nextInt(4) == 0) "junk" else rnd.nextDouble().toString
        (id, v)
      }
      val df = rows.toDF("id", "v")
      val out = new Checker(df, TableMeta.fromYamlString(checkerYaml),
        LocalDate.of(2026, 8, 12)).annotate(singlePass = seed % 2 == 0)
      assert(out.count() === 20L * 3, s"seed=$seed")
      val bad = out.filter(
        !(col("check_score") === 0 || col("check_score") === 1) ||
        (col("check_score") === 1 && col("check_result") =!= "passed") ||
        (col("check_score") === 0 && col("check_result") =!= "failed"))
      assert(bad.count() === 0, s"seed=$seed")
    }
  }

  test("dupGroups equals an independent union-find on random graphs") {
    import spark.implicits._
    for (seed <- 20 to 25) {
      val rnd = new Random(seed)
      val nodes = 30 + rnd.nextInt(40)
      val nEdges = 10 + rnd.nextInt(50)
      val edges = (0 until nEdges).map { _ =>
        val a = rnd.nextInt(nodes).toLong
        val b = rnd.nextInt(nodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      if (edges.nonEmpty) {
        // reference: plain in-memory union-find with path compression
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap
        // force the DISTRIBUTED pointer-jumping path (the default would
        // take the driver union-find fast path here — circular)
        val distributed = graft.dedup.Dedup.dupGroups(
            edges.toDF("id_a", "id_b"), smallGraphEdges = 0L)
          .as[(Long, Long)].collect().toMap
        assert(distributed === expected, s"seed=$seed nodes=$nodes edges=${edges.size}")
        // and the fast path must agree with the distributed one
        val fast = graft.dedup.Dedup.dupGroups(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(fast === distributed, s"seed=$seed (fast vs distributed)")
      }
    }
  }

  test("jaccard ∈ [0,1], symmetric, 1 on self for non-empty shingle sets") {
    import spark.implicits._
    val rnd = new Random(42)
    val texts = (0 until 15).map { _ =>
      (0 until 4 + rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(12)}").mkString(" ")
    }
    val pairs = (for (a <- texts; b <- texts.take(5)) yield (a, b)).toDF("a", "b")
    val out = pairs.select(
      graft.dedup.Dedup.ngramJaccard(col("a"), col("b"), 3).as("jab"),
      graft.dedup.Dedup.ngramJaccard(col("b"), col("a"), 3).as("jba"),
      graft.dedup.Dedup.ngramJaccard(col("a"), col("a"), 3).as("jaa"))
      .as[(Double, Double, Double)].collect()
    out.foreach { case (jab, jba, jaa) =>
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab === jba)
      assert(jaa === 1.0)
    }
  }

  test("QUALIFY split is reversible and respects nesting for random embeddings") {
    val preds = Seq("rn = 1", "ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) = 1")
    val bodies = Seq(
      "SELECT a FROM t",
      "SELECT a, 'QUALIFY' AS s FROM t",
      "SELECT * FROM (SELECT a FROM t QUALIFY rn = 1) x",
      "SELECT a -- QUALIFY rn = 1\nFROM t")
    for (b <- bodies; p <- preds) {
      val (inner, pred) = QualifyRewrite.split(s"$b\nQUALIFY $p")
      assert(inner.trim === b)
      assert(pred === Some(p))
    }
    for (b <- bodies) {
      assert(QualifyRewrite.split(b) === ((b, None)), b)
    }
  }

  test("mp4 mux→demux round-trips on random tracks (incl. empty samples)") {
    import graft.mm.Mp4
    val rnd = new Random(42)
    for (_ <- 1 to 25) {
      val n = 1 + rnd.nextInt(12)
      val timescale = 1 + rnd.nextInt(100000)
      val durations = Seq.fill(n)(1 + rnd.nextInt(10000))
      val samples = Seq.fill(n)(
        Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
      val w = 1 + rnd.nextInt(4096)
      val h = 1 + rnd.nextInt(2160)
      val frames = Mp4.demux(1L, Mp4.mux(w, h, timescale, durations, samples))
      assert(frames.length === n)
      assert(frames.map(_.sample_size) === samples.map(_.length.toLong))
      assert(frames.map(_.sample.toSeq) === samples.map(_.toSeq))
      val prefix = durations.map(_.toLong).scanLeft(0L)(_ + _).init
      assert(frames.map(_.ts_ms) === prefix.map(_ * 1000L / timescale))
      assert(frames.forall(f => f.width == w && f.height == h))
    }
  }

  test("aggregate IVM: random update/delete/insert sequences keep incremental == full recompute") {
    import spark.implicits._
    import graft.catalog.{TableRef, Warehouse}
    import graft.gold.Views
    import Views.AggSpec
    val specs = Seq(AggSpec("n", "count"), AggSpec("total", "sum", "cents"),
      AggSpec("lo", "min", "cents"), AggSpec("hi", "max", "cents"),
      AggSpec("mean", "avg", "cents"),
      // sketch-algebraic arm: insert-only groups union sketches,
      // retraction-touched groups recompute — the random mix hits both
      AggSpec("ndv_tags", "approx_ndv", "tag"))
    // second view WITHOUT min/max: with them present every retraction
    // routes through the full-recompute path, so this list is what
    // forces avg's signed component deltas (and sum/count's) through
    // the PURE-DELTA merge under random retractions
    val deltaOnlySpecs = Seq(AggSpec("n", "count"),
      AggSpec("total", "sum", "cents"), AggSpec("mean", "avg", "cents"))
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      val wh = new Warehouse(spark, tmpDir(s"wh-ivm-prop-$seed"))
      val base = TableRef("silver", "p", "rows")
      val gold = TableRef("gold", "p", "stats")
      val goldD = TableRef("gold", "p", "stats_delta")
      val mt = new graft.sinks.MergeTable(spark, wh, base, Seq("id"), None)
      var nextId = 0L
      def freshRows(n: Int): Seq[(Long, Long, Long, String)] =
        (0 until n).map { _ =>
          nextId += 1
          (nextId, rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong - 200L,
            s"t${rnd.nextInt(4)}")
        }
      mt.upsert(freshRows(30).toDF("id", "k", "cents", "tag"))
      var since = Views.materializeAgg(spark, wh, gold, base, Seq("k"), specs)
      var sinceD = Views.materializeAgg(spark, wh, goldD, base, Seq("k"),
        deltaOnlySpecs)
      for (step <- 1 to 4) {
        // random mutation mix: re-key/re-price some survivors, delete a
        // random key class, insert fresh rows (possibly new groups)
        val survivors = wh.read(base).as[(Long, Long, Long, String)].collect()
        val updates = rnd.shuffle(survivors.toSeq).take(survivors.length / 3)
          .map { case (id, _, _, _) =>
            (id, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong - 200L,
              s"t${rnd.nextInt(4)}") }
        if (updates.nonEmpty) mt.upsert(updates.toDF("id", "k", "cents", "tag"))
        wh.deleteWhere(base, $"id" % 7 === (step % 7).toLong)
        mt.upsert(freshRows(5 + rnd.nextInt(10)).toDF("id", "k", "cents", "tag"))
        since = Views.refreshIncrementalAgg(spark, wh, gold, base, since,
          Seq("k"), specs, Seq("id"))
        sinceD = Views.refreshIncrementalAgg(spark, wh, goldD, base, sinceD,
          Seq("k"), deltaOnlySpecs, Seq("id"))
        val incr = wh.read(gold)
          .select($"k", $"n", $"total", $"lo", $"hi", $"mean", $"ndv_tags")
          .as[(Long, Long, Long, Long, Long, Double, Long)]
          .collect().sortBy(_._1).toSeq
        // ndv compares the maintained sketch's ESTIMATE to a one-shot
        // recompute sketch's — exact equality, because HLL state
        // depends only on the hashed-value set (union-of-subsets
        // covers the same set); at these cardinalities it also equals
        // the true distinct count
        val full = wh.read(base).groupBy("k")
          .agg(count(lit(1)).as("n"), sum("cents").as("total"),
            min("cents").as("lo"), max("cents").as("hi"),
            avg("cents").as("mean"),
            hll_sketch_estimate(hll_sketch_agg($"tag")).as("ndv_tags"))
          .as[(Long, Long, Long, Long, Long, Double, Long)]
          .collect().sortBy(_._1).toSeq
        assert(incr === full, s"seed=$seed step=$step")
        val incrD = wh.read(goldD).select($"k", $"n", $"total", $"mean")
          .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
        assert(incrD === full.map(r => (r._1, r._2, r._3, r._6)),
          s"delta-only view: seed=$seed step=$step")
      }
    }
  }

  test("metadata aggregates equal full recomputation across random churn") {
    import spark.implicits._
    import graft.catalog.{TableRef, Warehouse}
    // every write path (overwrite / insert+update merge / row-level
    // delete) must leave the manifest able to answer count/min/max
    // EXACTLY — the provability rules may refuse (None → scan), but a
    // provable answer must never drift from the full recompute
    for (seed <- 30 to 32) {
      val rnd = new Random(seed)
      val wh = new Warehouse(spark, tmpDir(s"wh-prop-magg-$seed"))
      val ref = TableRef("p", "g", "magg")
      def frame(n: Int, lo: Long): DataFrame =
        (lo until lo + n).map(i =>
          (i, if (rnd.nextBoolean()) Some(rnd.nextInt(1000).toLong) else None))
          .toDF("k", "n")
      wh.overwrite(ref, frame(60 + rnd.nextInt(60), 0).repartition(3),
        statsColumns = Seq("k", "n"))
      val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
      val shapes = Seq(Warehouse.RowCount, Warehouse.ColCount("n"),
        Warehouse.ColMin("k"), Warehouse.ColMax("k"),
        Warehouse.ColMin("n"), Warehouse.ColMax("n"))
      for (step <- 1 to 5) {
        rnd.nextInt(3) match {
          case 0 => mt.upsert(
            frame(10 + rnd.nextInt(60), rnd.nextInt(400).toLong).repartition(2))
          case 1 => wh.deleteWhere(ref, $"k" % (2 + rnd.nextInt(4)).toLong === 0L)
          case 2 => wh.overwrite(ref,
            frame(40 + rnd.nextInt(60), rnd.nextInt(200).toLong).repartition(2),
            statsColumns = Seq("k", "n"))
        }
        val got = wh.metadataAggregate(ref, wh.snapshot(ref).get.files, shapes)
          .getOrElse(fail(s"manifest must stay fully accountable " +
            s"after warehouse writes: seed=$seed step=$step"))
        val exp = wh.read(ref).agg(count(lit(1)), count($"n"),
          min($"k"), max($"k"), min($"n"), max($"n")).head()
        assert(got.toSeq === exp.toSeq, s"seed=$seed step=$step")
      }
    }
  }

  test("change feed folds to the final table across random churn") {
    import spark.implicits._
    import graft.catalog.{TableRef, Warehouse}
    // the .changes surface's soundness invariant: replaying the feed —
    // per commit, deletes then upserts (the full-replace derivation's
    // order), pre-images ignored — must reconstruct the live table
    // EXACTLY, whatever mix of merge/delete/update/compact produced it
    for (seed <- 40 to 42) {
      val rnd = new Random(seed)
      val root = tmpDir(s"wh-prop-cdf-$seed")
      val wh = new Warehouse(spark, root)
      val ref = TableRef("p", "g", "cdf")
      def frame(n: Int, lo: Long): DataFrame =
        (lo until lo + n).map(i => (i, rnd.nextInt(1000).toLong)).toDF("k", "v")
      wh.overwrite(ref, frame(40 + rnd.nextInt(40), 0).repartition(3),
        statsColumns = Seq("k"))
      wh.setChangeDataFeed(ref, enabled = true)
      val mt = new graft.sinks.MergeTable(spark, wh, ref, Seq("k"), None)
      for (_ <- 1 to 6) rnd.nextInt(4) match {
        case 0 => mt.upsert(
          frame(10 + rnd.nextInt(40), rnd.nextInt(300).toLong).repartition(2))
        case 1 => wh.deleteWhere(ref, $"k" % (2 + rnd.nextInt(4)).toLong === 0L)
        case 2 => wh.compact(ref) // maintenance: must contribute nothing
        case 3 => wh.updateWhere(ref, $"k" % 5L === 1L,
          Seq("v" -> ($"v" + 1000L)))
      }
      val cat = s"graftpcdf$seed"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val feed = spark.sql(s"SELECT k, v, _change_type, _commit_version " +
        s"FROM $cat.p.g.cdf.changes").collect()
      val state = scala.collection.mutable.Map.empty[Long, Long]
      feed.groupBy(_.getLong(3)).toSeq.sortBy(_._1).foreach { case (_, rows) =>
        rows.filter(_.getString(2) == "delete")
          .foreach(r => state.remove(r.getLong(0)))
        rows.filter(r => r.getString(2) == "insert" ||
            r.getString(2) == "update_postimage")
          .foreach(r => state.put(r.getLong(0), r.getLong(1)))
      }
      val finalState = wh.read(ref).as[(Long, Long)].collect().toMap
      assert(state.toMap === finalState, s"seed=$seed")
    }
  }
}
