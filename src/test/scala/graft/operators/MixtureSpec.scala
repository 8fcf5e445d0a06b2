package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixtureSpec extends SparkSpec {

  test("mixtureSelect equals the per-group cumulative window at every budget") {
    import spark.implicits._
    val df = (1L to 600L)
      .map(i => (i, s"src${(i % 5)}", (i * 37) % 101, (i % 9) + 1))
      .toDF("id", "source", "pri", "tok")
      .repartition(7)
    val budgets = Seq(("src0", 50L), ("src1", 120L), ("src2", 0L),
      ("src3", 999999L), ("src4", 77L)).toDF("source", "__budget")
    val out = Mixture.mixtureSelect(df, "source",
        Seq($"pri".desc, $"id".asc), $"tok", budgets)
      .select($"id", $"__cum_cost").as[(Long, Long)].collect().toMap
    // oracle: single window per group (fine at spec scale)
    val w = Window.partitionBy($"source").orderBy($"pri".desc, $"id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("cum", sum($"tok").over(w))
      .join(budgets, Seq("source"))
      .filter($"cum" <= $"__budget")
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(out === expected)
    assert(out.nonEmpty)
    // zero-budget group contributes nothing
    assert(!out.keySet.exists(_ % 5 == 2))
  }

  test("groups absent from the budget frame are dropped entirely") {
    import spark.implicits._
    val df = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("id", "source", "tok")
    val budgets = Seq(("a", 100L)).toDF("source", "__budget")
    val ids = Mixture.mixtureSelect(df, "source", Seq($"id".asc), $"tok",
      budgets).select("id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("a single hot group spreads across range slices and stays exact") {
    import spark.implicits._
    // 90% of rows in one group: the per-(slice, group) offsets must
    // stitch that group's running sum across many partitions
    val df = (1L to 1000L)
      .map(i => (i, if (i % 10 == 0) "cold" else "hot", 2L))
      .toDF("id", "source", "tok")
    val budgets = Seq(("hot", 1000L), ("cold", 6L)).toDF("source", "__budget")
    val out = Mixture.mixtureSelect(df, "source",
        Seq($"id".asc), $"tok", budgets)
    val byGroup = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("__cum_cost").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byGroup("hot") === ((500L, 1000L)))
    assert(byGroup("cold") === ((3L, 6L)))
  }

  test("non-string group column fails loudly") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("id", "grp", "tok")
    val budgets = Seq(("x", 1L)).toDF("grp", "__budget")
    val e = intercept[IllegalArgumentException] {
      Mixture.mixtureSelect(df, "grp", Seq($"id".asc), $"tok", budgets)
    }
    assert(e.getMessage.contains("must be string"))
  }
}
