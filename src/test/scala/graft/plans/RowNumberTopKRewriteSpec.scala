package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RowNumberTopKRewriteSpec extends SparkSpec {

  /** Run `build` with the rewrite active; returns (rows, executedPlan). */
  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RowNumberTopKRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RowNumberTopKRewrite)
  }

  private def sales = {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 4000).map(i =>
      (s"g${rnd.nextInt(50)}", i.toLong, rnd.nextInt(200).toDouble,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5))))
      .toDF("grp", "id", "amount", "maybe").repartition(6)
  }

  private def topkQuery(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("amount").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("rewrites rn <= k into the sort_topk aggregate with identical results") {
    val plain = topkQuery(sales, 4).collect().map(_.toSeq).toSet
    val (rewritten, plan) = withRule {
      val df = topkQuery(sales, 4)
      (df.collect().map(_.toSeq).toSet, df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("graft_sort_topk"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("RunningWindowFunction"),
      s"window survived the rewrite:\n$plan")
    assert(rewritten === plain)
  }

  test("rn === 1 (the W1 latest-per-key shape) rewrites and matches") {
    import spark.implicits._
    val w = Window.partitionBy($"grp").orderBy($"amount".desc, $"id".desc)
    def w1(df: DataFrame) = df.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    val plain = w1(sales).collect().map(_.toSeq).toSet
    val (got, plan) = withRule {
      val df = w1(sales)
      (df.collect().map(_.toSeq).toSet, df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("graft_sort_topk"), s"rewrite did not fire:\n$plan")
    assert(got === plain)
  }

  test("null ordering keys follow the window's nulls placement") {
    import spark.implicits._
    // default asc = NULLS FIRST, desc = NULLS LAST in Spark
    val w = Window.partitionBy($"grp").orderBy($"maybe".asc, $"id".asc)
    def q(df: DataFrame) = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
    val plain = q(sales).collect().map(_.toSeq).toSet
    val got = withRule(q(sales).collect().map(_.toSeq).toSet)
    assert(got === plain)
  }

  test("non-matching shapes are left alone") {
    import spark.implicits._
    val w = Window.partitionBy($"grp").orderBy($"id".asc)
    // rn > 1 (dup-flagging) and rank() are NOT top-k shapes
    val dupFlags = sales.withColumn("rn", row_number().over(w)).filter($"rn" > 1)
    val ranked = sales.withColumn("r", rank().over(w)).filter($"r" <= 2)
    withRule {
      assert(!dupFlags.queryExecution.executedPlan.toString.contains("graft_sort_topk"))
      assert(!ranked.queryExecution.executedPlan.toString.contains("graft_sort_topk"))
      // and they still compute correctly: every group loses exactly its rank-1 row
      assert(dupFlags.count() === sales.count() - sales.select("grp").distinct().count())
    }
  }

  test("the session flag disables the rewrite") {
    import spark.implicits._
    spark.conf.set(RowNumberTopKRewrite.EnabledKey, "false")
    try withRule {
      val plan = topkQuery(sales, 4).queryExecution.executedPlan.toString
      assert(!plan.contains("graft_sort_topk"), plan)
    } finally spark.conf.unset(RowNumberTopKRewrite.EnabledKey)
  }

  test("write-time NDV stats gate the rewrite: near-unique keys keep the window") {
    import spark.implicits._
    import graft.catalog.{TableRef, Warehouse}
    val wh = new Warehouse(spark, tmpDir("wh-ndv"))
    val uniq = TableRef("silver", "t", "uniq")
    val dup = TableRef("silver", "t", "dup")
    val n = 5000
    // ndvColumns: per-file NDV is opt-in since the footer-stats change
    // (undeclared tables derive commit stats from parquet footers,
    // which carry no distinct counts) — the skip under test needs it
    wh.overwrite(uniq, (1 to n).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
      statsColumns = Seq("k"), ndvColumns = Seq("k"))
    wh.overwrite(dup, (1 to n).map(i => ((i % 20).toLong, i.toDouble)).toDF("k", "v"),
      statsColumns = Seq("k"), ndvColumns = Seq("k"))
    def q(df: DataFrame) = {
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    }
    withRule {
      val uplan = q(wh.read(uniq)).queryExecution.executedPlan.toString
      assert(!uplan.contains("graft_sort_topk"),
        s"near-unique keys should keep the window form:\n$uplan")
      val dplan = q(wh.read(dup)).queryExecution.executedPlan.toString
      assert(dplan.contains("graft_sort_topk"),
        s"low-cardinality keys should still rewrite:\n$dplan")
      // semantics identical on both paths
      assert(q(wh.read(uniq)).count() === n)
      assert(q(wh.read(dup)).count() === 20)
      // ratio > 1 disables the stats skip
      spark.conf.set(RowNumberTopKRewrite.NdvSkipRatioKey, "2.0")
      try {
        val forced = q(wh.read(uniq)).queryExecution.executedPlan.toString
        assert(forced.contains("graft_sort_topk"), forced)
      } finally spark.conf.unset(RowNumberTopKRewrite.NdvSkipRatioKey)
    }
  }

  test("global top-k (empty partition) rewrites too") {
    import spark.implicits._
    val w = Window.orderBy($"amount".desc, $"id".asc)
    def q(df: DataFrame) = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 7).select($"rn", $"id")
    val plain = q(sales).collect().map(_.toSeq).toSet
    val (got, plan) = withRule {
      val df = q(sales)
      (df.collect().map(_.toSeq).toSet, df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("graft_sort_topk"), s"rewrite did not fire:\n$plan")
    assert(got === plain)
  }
}
