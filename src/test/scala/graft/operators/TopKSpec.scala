package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  private def sales = {
    import spark.implicits._
    Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 5.0),
      ("c", 6L, 1.0), ("c", 7L, 1.0), ("c", 8L, 1.0)
    ).toDF("grp", "id", "amount")
  }

  test("native heap aggregate keeps the k best with deterministic ties") {
    import spark.implicits._
    val got = TopK.perKey(sales, Seq("grp"), "amount", "id", 2)
      .select($"grp", $"rank", $"id", $"amount")
      .as[(String, Int, Long, Double)].collect().toSet
    assert(got === Set(
      ("a", 1, 2L, 30.0), // ties on 30.0 → lowest id first
      ("a", 2, 4L, 30.0),
      ("b", 1, 5L, 5.0),  // group smaller than k
      ("c", 1, 6L, 1.0),  // all-ties → ids ascending
      ("c", 2, 7L, 1.0)))
  }

  test("native and window paths agree on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map(i =>
      (s"g${rnd.nextInt(40)}", i.toLong, rnd.nextInt(100).toDouble))
      .toDF("grp", "id", "amount").repartition(7)
    val native = TopK.perKey(df, Seq("grp"), "amount", "id", 5)
      .select($"grp", $"rank", $"id").as[(String, Int, Long)].collect().toSet
    // window fallback, forced
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"amount".desc, $"id".asc)
    val windowed = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"grp", $"rank", $"id").as[(String, Int, Long)].collect().toSet
    assert(native === windowed)
  }

  test("aggregate plans with partial (map-side) top-k before the exchange") {
    val plan = TopK.perKey(sales, Seq("grp"), "amount", "id", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_topk_by"), plan)
  }

  test("property: heap buffer equals global sort-and-take on random streams") {
    import graft.functions.TopKBuffer
    val rnd = new scala.util.Random(99)
    (1 to 50).foreach { trial =>
      val k = 1 + rnd.nextInt(7)
      val n = rnd.nextInt(200)
      val entries = (0 until n).map(i => (rnd.nextInt(20).toDouble, i.toLong))
      val buf = new TopKBuffer(k)
      entries.foreach { case (o, t) => buf.offer(o, t, s"v$t") }
      // expected: sort by (ord desc, tie asc), take k
      val expected = entries.sortBy { case (o, t) => (-o, t) }.take(k)
        .map { case (_, t) => s"v$t" }
      val got = buf.sortedBestFirst.map(_.value).toSeq
      assert(got === expected, s"trial $trial k=$k n=$n")
    }
  }

  test("NaN ord sorts greatest, matching the window fallback's sort order") {
    import graft.functions.TopKBuffer
    // fill the heap first so NaN must DISPLACE a worse entry — the
    // primitive-comparison bug made that displacement never happen
    val buf = new TopKBuffer(2)
    buf.offer(1.0, 1L, "a")
    buf.offer(2.0, 2L, "b")
    buf.offer(Double.NaN, 3L, "nan")
    assert(buf.sortedBestFirst.map(_.value).toSeq === Seq("nan", "b"))
    // two NaNs tie-break on tie (ascending), like orderBy would
    val buf2 = new TopKBuffer(2)
    buf2.offer(Double.NaN, 9L, "nan9")
    buf2.offer(Double.NaN, 1L, "nan1")
    buf2.offer(Double.NaN, 5L, "nan5")
    assert(buf2.sortedBestFirst.map(_.value).toSeq === Seq("nan1", "nan5"))
  }

  test("property: merging split buffers equals one buffer over the whole stream") {
    import graft.functions.TopKBuffer
    val rnd = new scala.util.Random(101)
    (1 to 30).foreach { trial =>
      val k = 1 + rnd.nextInt(5)
      val entries = (0 until 150).map(i => (rnd.nextInt(10).toDouble, i.toLong))
      val whole = new TopKBuffer(k)
      entries.foreach { case (o, t) => whole.offer(o, t, t) }
      val parts = entries.grouped(40).map { chunk =>
        val b = new TopKBuffer(k)
        chunk.foreach { case (o, t) => b.offer(o, t, t) }
        b
      }
      val merged = parts.reduce { (a, b) =>
        b.entries.forEach(e => a.offer(e.ord, e.tie, e.value)); a
      }
      assert(merged.sortedBestFirst.map(_.value).toSeq ===
        whole.sortedBestFirst.map(_.value).toSeq, s"trial $trial k=$k")
    }
  }

  test("null ordering keys are skipped, not ranked") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, Some(20.0))
    ).toDF("grp", "id", "amount")
    val got = TopK.perKey(df, Seq("grp"), "amount", "id", 5)
      .select($"id").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }
}
