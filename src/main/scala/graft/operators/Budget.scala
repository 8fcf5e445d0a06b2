package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: keep the highest-priority documents
  * whose cumulative cost (token count) fits a budget — the operator a
  * training-data pipeline runs last, after filtering and dedup ("give
  * me the best N-billion tokens").
  *
  * The naive formulation — `sum(cost) OVER (ORDER BY priority)` with no
  * partitioning — collapses the whole corpus into ONE window task (Spark
  * even warns). This implementation is the distributed two-phase prefix
  * sum instead:
  *
  *  1. `repartitionByRange` on the priority ordering — partition i holds
  *     a contiguous slice of the global order;
  *  2. per-partition cost totals (one tiny aggregate: ≤ one row per
  *     partition) are collected and turned into exclusive prefix
  *     offsets — a bounded-small driver collect, like IVF's centroid
  *     list;
  *  3. a window partitioned BY PARTITION computes local running sums in
  *     parallel; adding the broadcast offset yields the exact global
  *     cumulative cost, and the budget predicate filters.
  *
  * The ordering must be TOTAL (pass a unique tie-break column) — ties
  * straddling a partition boundary would otherwise make the range
  * partitioner's slice order disagree with the window's.
  */
object Budget {

  /** @param ordering  priority order, highest first, totally ordered
    *                  (e.g. `Seq(col("score").desc, col("id").asc)`)
    * @param cost      per-row cost expression (e.g. a token count)
    * @param budget    inclusive cumulative-cost ceiling
    * @return input rows whose running cost (in `ordering`) stays within
    *         `budget`, with the running total as `__cum_cost`
    */
  def budgetSelect(df: DataFrame, ordering: Seq[Column], cost: Column,
                   budget: Long): DataFrame =
    // the grouped core with one constant group IS the ungrouped prefix
    // sum: a constant leading range key changes no slice boundaries,
    // and the (slice, group) window degenerates to per-slice. The
    // delicate machinery (layout pin, exclusive offsets, per-slice
    // windows) lives once, in Mixture.groupedCumCost; phase rows stay
    // budget.pin / budget.totals.
    Mixture.groupedCumCost(
        df.withColumn("__grp", lit("")), "__grp", ordering, cost, "budget")
      .filter(col("__cum_cost") <= budget)
      .drop("__grp")

  /** Selection-only variant — the 100 TB path. [[budgetSelect]] moves
    * the corpus twice (range layout + a hash exchange for the per-slice
    * window, since Catalyst cannot see that the checkpointed layout
    * already clusters by slice). When the output needs no per-row
    * running total, the corpus never has to shuffle at all:
    *
    *  1. per-priority cost totals — a THIN aggregate (|distinct
    *     priorities| rows);
    *  2. [[budgetSelect]] over that thin frame finds the fully-kept
    *     priority prefix and how much budget it used;
    *  3. the single boundary priority group (the first one that didn't
    *     fully fit) resolves by tie-break order with a second thin
    *     pass over just its rows;
    *  4. the corpus is touched only by a broadcast semi-join on the
    *     kept priorities plus the boundary union.
    *
    * Identical selection to `budgetSelect(df, priority desc, tie asc)`
    * (BudgetSpec proves equality).
    */
  def budgetFilter(df: DataFrame, priorityCol: String, tieCol: String,
                   cost: Column, budget: Long): DataFrame = {
    val costed = df.withColumn("__cost", cost.cast("long"))
    val perPriority = costed.groupBy(col(priorityCol))
      .agg(sum("__cost").as("__psum"))
    val keptPriorities = budgetSelect(perPriority,
      Seq(col(priorityCol).desc), col("__psum"), budget)
    // two bounded scalars in ONE driver action (each action is a full
    // job round-trip — at toy scale the fixed overhead dominates this
    // operator): budget already spent (max kept cumulative cost), and
    // the boundary priority (highest priority NOT fully kept = null
    // cum_cost after the left join)
    val scalars = graft.util.PhaseTimer.time("budget.scalars") {
      perPriority
        .join(keptPriorities.select(col(priorityCol), col("__cum_cost")),
          Seq(priorityCol), "left")
        .agg(max("__cum_cost").as("__used"),
          max(when(col("__cum_cost").isNull, col(priorityCol))).as("__boundary"))
        .head()
    }
    val used = if (scalars.isNullAt(0)) 0L else scalars.getLong(0)
    val boundaryRow = scalars
    val fullyKept = df
      .join(broadcast(keptPriorities.select(priorityCol)), Seq(priorityCol), "left_semi")
    if (boundaryRow.isNullAt(1)) fullyKept.drop("__cost")
    else {
      val boundary = boundaryRow.get(1)
      val partial = budgetSelect(
        df.filter(col(priorityCol) === lit(boundary)),
        Seq(col(tieCol).asc), cost, budget - used)
        .drop("__cum_cost")
      fullyKept.unionByName(partial)
    }
  }
}
