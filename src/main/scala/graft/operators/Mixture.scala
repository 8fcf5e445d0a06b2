package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture corpus selection: per-source token budgets, the
  * "data recipe" stage of a training pipeline — e.g. "2B tokens of
  * code, 1B of encyclopedia, 500M of forums, each taking its
  * highest-priority documents first". The reference has no counterpart
  * (its curation is row-filter only); this is the composition of
  * [[Budget.budgetSelect]] with a grouping: an independent
  * cumulative-cost ceiling per group, resolved in ONE pass over the
  * corpus instead of one job per source.
  *
  * [[groupedCumCost]] is the shared distributed-prefix-sum core —
  * [[Budget.budgetSelect]] delegates here with a constant group (one
  * global ordering), so the delicate parts (the pinned range layout,
  * the exclusive-offset scan, the per-slice windows) exist exactly
  * once. Why not the naive `sum() OVER (PARTITION BY group ORDER BY
  * priority)`: per-group windows do parallelize across groups, but a
  * HOT group still collapses into one task — range-slicing keeps even
  * a group holding 90% of the corpus spread over many tasks:
  *
  *  1. `repartitionByRange` on (group, ordering…) — each partition
  *     holds a contiguous slice of one-or-more groups' orderings;
  *  2. per-(slice, group) cost totals — a driver collect of at most
  *     `partitions + |groups| - 1` rows (contiguity means a group
  *     spans a contiguous slice range, so the pair count is bounded
  *     by slices + group boundaries);
  *  3. exclusive prefix offsets per group across its slices, broadcast
  *     back; a window partitioned by (slice, group) finishes the exact
  *     global per-group running cost in parallel.
  */
object Mixture {

  /** The grouped two-phase prefix sum: input rows + `__cum_cost` (the
    * exact per-group running total of `cost` in `ordering`). The
    * ordering must be TOTAL within a group (unique tie-break) — ties
    * straddling a slice boundary would let the range partitioner and
    * the window disagree. Rows with a NULL group are dropped (the
    * offset join is inner; a mixture has no null domain). Phase rows
    * `<phasePrefix>.pin` / `.totals` attribute the two driver-side
    * stages in the bench artifact.
    */
  private[operators] def groupedCumCost(df: DataFrame, groupCol: String,
                                        ordering: Seq[Column], cost: Column,
                                        phasePrefix: String): DataFrame = {
    val spark = df.sparkSession
    // the driver round-trips group values through a typed Seq; string
    // domains (source/lang/dataset names) are the use case
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"group column must be string: $groupCol is " +
        df.schema(groupCol).dataType.simpleString)
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint pins the sampled range layout: offsets computed
    // against one slicing must be applied to that exact slicing (the
    // partitioner's sampled bounds are not replay-stable)
    val ranged = graft.util.PhaseTimer.time(s"$phasePrefix.pin") {
      graft.util.Scratch.transientCheckpoint(
        df.withColumn("__cost", cost.cast("long"))
          .repartitionByRange(parts, col(groupCol) +: ordering: _*)
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint())
    }
    // bounded: ≤ partitions + |groups| - 1 rows (slice/group contiguity)
    val totals = graft.util.PhaseTimer.time(s"$phasePrefix.totals") {
      ranged.groupBy(col("__pid"), col(groupCol))
        .agg(sum("__cost").as("__psum"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        .toSeq
    }
    val offsets = totals.groupBy(_._2).iterator.flatMap { case (g, rows) =>
      rows.sortBy(_._1).scanLeft((Int.MinValue, g, 0L)) {
        case ((_, _, acc), (pid, _, s)) => (pid, g, acc + s)
      }.sliding(2).collect { case Seq((_, _, acc), (pid, _, _)) =>
        (pid, g, acc)
      }
    }.toSeq
    import spark.implicits._
    val offsetDf = offsets.toDF("__pid", groupCol, "__offset")
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsetDf), Seq("__pid", groupCol))
      .withColumn("__cum_cost", sum(col("__cost")).over(w) + col("__offset"))
      .drop("__pid", "__offset", "__cost")
  }

  /** @param groupCol  mixture-domain column (e.g. `source`)
    * @param ordering  per-group priority, highest first, totally
    *                  ordered (pass a unique tie-break)
    * @param cost      per-row cost (e.g. token count); cast to long
    * @param budgets   two columns: `groupCol`, `__budget` (long) — one
    *                  row per group; groups absent from the frame are
    *                  dropped entirely (budget 0)
    * @return rows whose per-group running cost stays within the
    *         group's budget, with the running total as `__cum_cost`
    */
  def mixtureSelect(df: DataFrame, groupCol: String, ordering: Seq[Column],
                    cost: Column, budgets: DataFrame): DataFrame =
    groupedCumCost(df, groupCol, ordering, cost, "mixture")
      .join(broadcast(budgets), Seq(groupCol))
      .filter(col("__cum_cost") <= col("__budget"))
      .drop("__budget")
}
