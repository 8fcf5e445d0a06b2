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
}
