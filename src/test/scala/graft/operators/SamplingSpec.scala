package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def ids = spark.range(0, 10000).toDF("id")

  test("deterministic sample is invariant to physical layout") {
    val a = Sampling.deterministicSample(ids, "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids.repartition(17), "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // roughly the requested fraction (multiplicative hashing is uniform
    // enough on sequential keys for a wide tolerance)
    assert(a.size > 2000 && a.size < 4000, s"got ${a.size} of 10000 at 0.3")
  }

  test("exactSample: exactly k, layout-invariant, salt-sensitive, k >= n keeps all") {
    val a = Sampling.exactSample(ids, "id", 500)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a.size === 500)
    val b = Sampling.exactSample(ids.repartition(23), "id", 500)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b, "the exact-k set must not depend on physical layout")
    val c = Sampling.exactSample(ids, "id", 500, salt = 9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a !== c)
    assert(Sampling.exactSample(ids, "id", 20000).count() === 10000L)
    // the plan is the distributed top-k, never a global sort
    val plan = Sampling.exactSample(ids, "id", 500)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(300))
  }

  test("different salts draw different samples") {
    val a = Sampling.deterministicSample(ids, "id", 0.3, salt = 0)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids, "id", 0.3, salt = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
  }

  test("splitByKey partitions the keyspace disjointly and completely") {
    val Seq(train, valid, test) =
      Sampling.splitByKey(ids, "id", Seq(0.8, 0.1, 0.1))
    val (tr, va, te) = (
      train.collect().map(_.getLong(0)).toSet,
      valid.collect().map(_.getLong(0)).toSet,
      test.collect().map(_.getLong(0)).toSet)
    assert((tr & va).isEmpty && (tr & te).isEmpty && (va & te).isEmpty)
    assert(tr.size + va.size + te.size === 10000) // fractions sum to 1
    assert(tr.size > 7000) // dominant band dominates
  }

  test("negative pairs: layout-invariant, self-free, bounded fan-out, joined") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"s${i % 5}")).toDF("doc_id", "source")
    val corpus = docs.select(col("doc_id").as("neg_id"), col("source").as("neg_source"))
    def run(anchors: org.apache.spark.sql.DataFrame) =
      Sampling.negativePairs(anchors, corpus, "doc_id", "neg_id",
          corpusSize = 200L, k = 4, salt = 3L)
        .select($"doc_id", $"draw", $"neg_id", $"neg_source")
        .as[(Long, Int, Long, String)].collect().toSet
    val pairs = run(docs.select($"doc_id"))
    assert(pairs === run(docs.select($"doc_id").repartition(13)))
    assert(pairs.forall { case (a, _, n, _) => a != n && n >= 0 && n < 200 })
    // at most k partners per anchor, and most anchors get all k
    val perAnchor = pairs.groupBy(_._1).view.mapValues(_.size)
    assert(perAnchor.values.forall(_ <= 4))
    assert(perAnchor.values.count(_ == 4) > 150)
    // the joined payload is the partner's row, not the anchor's
    assert(pairs.forall { case (_, _, n, src) => src == s"s${n % 5}" })
  }

  test("stratified sample applies per-stratum fractions and drops absent strata") {
    import spark.implicits._
    val df = ids.withColumn("grp",
      when($"id" % 3 === 0, "a").when($"id" % 3 === 1, "b").otherwise("c"))
    val got = Sampling.stratifiedSample(df, "grp", "id",
      Map("a" -> 1.0, "b" -> 0.5))
    val byGrp = got.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("a") === 3334) // every 'a' row kept
    assert(byGrp("b") > 1000 && byGrp("b") < 2300)
    assert(!byGrp.contains("c")) // stratum not in the map → dropped
  }

  test("temperature sampling upweights rare classes and is layout-invariant") {
    import spark.implicits._
    // 9000 'big' rows vs 1000 'small' rows; alpha 0.5 flattens hard
    val df = ((1L to 9000L).map(i => (i, "big")) ++
      (9001L to 10000L).map(i => (i, "small"))).toDF("id", "grp")
    val out = Sampling.temperatureSample(df, "grp", "id",
      alpha = 0.5, targetRows = 2000L)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    // expected fractions: q_big = 95/(95+32), q_small = 32/127;
    // keep_big ≈ 2000*0.747/9000 ≈ 0.166, keep_small ≈ 2000*0.252/1000 ≈ 0.504
    assert(byGrp("big") > 1200 && byGrp("big") < 1800)
    assert(byGrp("small") > 400 && byGrp("small") < 600)
    // the small class keeps a ~3× higher fraction than the big one
    val fBig = byGrp("big").toDouble / 9000
    val fSmall = byGrp("small").toDouble / 1000
    assert(fSmall / fBig > 2.0)
    // deterministic: repartitioned input selects the identical rows
    val again = Sampling.temperatureSample(df.repartition(13), "grp", "id",
      alpha = 0.5, targetRows = 2000L)
    assert(again.select("id").as[Long].collect().toSet ===
      out.select("id").as[Long].collect().toSet)
    // alpha = 1 preserves the natural distribution: uniform keep rate
    val nat = Sampling.temperatureSample(df, "grp", "id",
      alpha = 1.0, targetRows = 2000L)
    val natByGrp = nat.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(natByGrp("big").toDouble / 9000 -
      natByGrp("small").toDouble / 1000) < 0.05)
  }

  test("leakageSafeSplit keeps whole near-dup groups in one band") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("id", "text")
    // groups: {1,2,3} canonical 1; {50,150} canonical 50
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (50L, 50L), (150L, 50L))
      .toDF("id", "canonical_id")
    val Seq(train, test) = Sampling.leakageSafeSplit(
      docs, "id", groups, Seq(0.5, 0.5))
    val trainIds = train.select("id").as[Long].collect().toSet
    val testIds = test.select("id").as[Long].collect().toSet
    // disjoint and total
    assert((trainIds & testIds).isEmpty)
    assert(trainIds.size + testIds.size === 200)
    // each group is entirely on one side
    Seq(Set(1L, 2L, 3L), Set(50L, 150L)).foreach { g =>
      assert(g.subsetOf(trainIds) || g.subsetOf(testIds))
    }
    // ungrouped rows follow their own key — same verdict as splitByKey
    val Seq(pt, _) = Sampling.splitByKey(docs.filter($"id" === 77L), "id", Seq(0.5, 0.5))
    val plain77 = pt.count() == 1
    assert(trainIds.contains(77L) === plain77)
  }

  test("epochUpsample: integral epochs copy exactly, fraction adds a hash band") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, i % 4)).toDF("id", "bin")
    // exactly 2 epochs: every row appears twice, epochs 0 and 1
    val two = Sampling.epochUpsample(df, "id", lit(2.0))
    assert(two.count() === 800)
    assert(two.groupBy("id").count().filter($"count" =!= 2).count() === 0)
    assert(two.select("epoch").distinct().as[Long].collect().toSet === Set(0L, 1L))
    // 1.5 epochs: everyone once, about half twice — and the extra-copy
    // set is exactly the deterministicSample(0.5) set
    val mid = Sampling.epochUpsample(df, "id", lit(1.5))
    val twice = mid.groupBy("id").count().filter($"count" === 2)
      .select("id").as[Long].collect().toSet
    val band = Sampling.deterministicSample(df, "id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(twice === band)
    assert(mid.count() === 400 + band.size)
    // sub-1 epochs: pure deterministic sample, epoch always 0
    val sub = Sampling.epochUpsample(df, "id", lit(0.25))
    val subIds = sub.select("id").as[Long].collect().toSet
    assert(subIds === Sampling.deterministicSample(df, "id", 0.25)
      .select("id").as[Long].collect().toSet)
    assert(sub.filter($"epoch" =!= 0).count() === 0)
    // layout-invariant: same copies after a repartition
    val re = Sampling.epochUpsample(df.repartition(13), "id", lit(1.5))
    assert(re.groupBy("id").count().filter($"count" === 2)
      .select("id").as[Long].collect().toSet === twice)
  }
}
