package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  test("every doc lands in exactly one bin; bins respect the budget") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1L to 2000L).map(i => (i, 1L + rnd.nextInt(300).toLong))
      .toDF("id", "w").repartition(4)
    val packed = Packing.packByWeight(docs, "id", "w", budget = 512L)
      .as[PackedDoc].collect()
    assert(packed.map(_.id).sorted.toSeq === (1L to 2000L))
    // recomputed bin sums match the reported fill and the budget
    packed.groupBy(_.bin_id).foreach { case (_, members) =>
      val total = members.map(_.weight).sum
      assert(members.forall(_.bin_weight == total))
      assert(total <= 512L || (members.length == 1 && members.head.oversize))
    }
    assert(packed.forall(d => d.oversize == d.weight > 512L))
  }

  test("oversize docs get singleton flagged bins, not dropped") {
    import spark.implicits._
    val docs = Seq((1L, 600L), (2L, 100L), (3L, 700L)).toDF("id", "w")
      .coalesce(1)
    val packed = Packing.packByWeight(docs, "id", "w", budget = 512L)
      .as[PackedDoc].collect()
    assert(packed.length === 3)
    val oversize = packed.filter(_.oversize)
    assert(oversize.map(_.id).sorted.toSeq === Seq(1L, 3L))
    assert(oversize.forall(d => d.bin_weight == d.weight))
  }

  test("FFD packs tightly: pairs that exactly fill the budget share bins") {
    import spark.implicits._
    // weights 312 and 200 pair to exactly 512: 10 of each → 10 bins
    val docs = ((1L to 10L).map(i => (i, 312L)) ++ (11L to 20L).map(i => (i, 200L)))
      .toDF("id", "w").coalesce(1)
    val packed = Packing.packByWeight(docs, "id", "w", budget = 512L)
      .as[PackedDoc].collect()
    assert(packed.map(_.bin_id).distinct.length === 10)
    assert(packed.groupBy(_.bin_id).values.forall(_.map(_.weight).sum == 512L))
  }

  test("bin ids are globally unique across partitions") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, 100L)).toDF("id", "w").repartition(8)
    val packed = Packing.packByWeight(docs, "id", "w", budget = 512L)
      .as[PackedDoc].collect()
    // 100-weight docs pack 5 per bin within each partition; partition
    // tag in the high bits keeps ids distinct across tasks
    val byBin = packed.groupBy(_.bin_id)
    assert(byBin.values.forall(_.length <= 5))
    assert(packed.map(_.id).distinct.length === 400)
  }

  test("empty input packs to nothing") {
    import spark.implicits._
    val docs = Seq.empty[(Long, Long)].toDF("id", "w")
    assert(Packing.packByWeight(docs, "id", "w", budget = 10L).count() === 0)
  }
}
