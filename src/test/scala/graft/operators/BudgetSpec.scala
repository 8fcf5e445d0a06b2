package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BudgetSpec extends SparkSpec {

  test("budgetSelect keeps the priority prefix whose cumulative cost fits") {
    import spark.implicits._
    // priority = score desc, tie-break id asc; costs chosen so the
    // budget cuts mid-order and a tie straddles the cutoff region
    val df = Seq(
      (1L, 9.0, 40L), (2L, 8.0, 30L), (3L, 8.0, 20L),
      (4L, 7.0, 25L), (5L, 6.0, 10L))
      .toDF("id", "score", "tok")
    val out = Budget.budgetSelect(df,
        Seq($"score".desc, $"id".asc), $"tok", budget = 95L)
      .select($"id", $"__cum_cost")
      .as[(Long, Long)].collect().toMap
    // order: 1(40) 2(70) 3(90) 4(115>95 stop) 5 never reached
    assert(out === Map(1L -> 40L, 2L -> 70L, 3L -> 90L))
  }

  test("budgetSelect is exact across many partitions and a huge budget keeps everything") {
    import spark.implicits._
    // 1000 rows spread over the session's 32 shuffle partitions: the
    // per-slice offsets must reproduce the single-window cumulative sum
    val df = (1L to 1000L).map(i => (i, i % 97, 3L)).toDF("id", "pri", "tok")
      .repartition(8)
    val out = Budget.budgetSelect(df,
        Seq($"pri".desc, $"id".asc), $"tok", budget = 601L)
      .select($"id", $"pri", $"__cum_cost").collect()
    assert(out.length === 200) // 601 / 3 = 200 rows fit
    // the running total on the selected set is contiguous multiples of 3
    assert(out.map(_.getLong(2)).sorted.toSeq === (1L to 200L).map(_ * 3))
    // everything fits an unbounded budget
    val all = Budget.budgetSelect(df,
      Seq($"pri".desc, $"id".asc), $"tok", budget = Long.MaxValue)
    assert(all.count() === 1000)
    // and the max running total is the exact corpus cost
    assert(all.agg(max("__cum_cost")).head.getLong(0) === 3000L)
  }

  test("budgetFilter selects the same rows as budgetSelect without corpus shuffles") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, i % 23, (i % 7) + 1)).toDF("id", "pri", "tok")
    for (budget <- Seq(3L, 100L, 777L, 10000L)) {
      val viaSelect = Budget.budgetSelect(df,
          Seq($"pri".desc, $"id".asc), $"tok", budget)
        .select("id").as[Long].collect().toSet
      val viaFilter = Budget.budgetFilter(df, "pri", "id", $"tok", budget)
        .select("id").as[Long].collect().toSet
      assert(viaFilter === viaSelect, s"budget=$budget")
    }
    // budget below the first row keeps nothing on either path
    assert(Budget.budgetFilter(df, "pri", "id", $"tok", 0L).count() === 0)
  }

  test("budget selection is monotone in the budget (prefix property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1L to 300L).map(i => (i, rnd.nextInt(50).toLong, (rnd.nextInt(9) + 1).toLong))
      .toDF("id", "pri", "tok")
    val budgets = Seq(10L, 80L, 300L, 900L)
    val selections = budgets.map { b =>
      Budget.budgetSelect(df, Seq($"pri".desc, $"id".asc), $"tok", b)
        .select("id").as[Long].collect().toSet
    }
    selections.sliding(2).foreach {
      case Seq(small, large) => assert(small.subsetOf(large))
      case _ =>
    }
  }

  test("budgetSelect on an empty frame returns empty") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "tok")
    assert(Budget.budgetSelect(df, Seq($"id".asc), $"tok", 10L).count() === 0)
  }
}
