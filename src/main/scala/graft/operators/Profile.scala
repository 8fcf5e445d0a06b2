package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality census every ingest pipeline
  * runs before trusting a new drop: per-column row/null/distinct
  * counts and min/max, emitted one row per column. The whole profile
  * is ONE aggregate job over the table (the per-column statistics are
  * parallel aggregate expressions in a single pass; the reshape to
  * rows is a `stack` over the single result row — driver-free).
  *
  * Two NDV modes:
  *  - `exact = true`: `count(DISTINCT c)` per column. Multiple
  *    distinct aggregates make Catalyst plan an Expand (input
  *    multiplied by the number of profiled columns before the
  *    shuffle) — exact, and what a value-checking oracle can verify,
  *    but at 100 TB profiling 50 columns that's a 50× expanded
  *    shuffle.
  *  - `exact = false`: `approx_count_distinct` (HyperLogLog++,
  *    relative error `rsd`). No Expand — all sketches ride one
  *    scan + one tiny final reduce. The 100 TB default; ProfileSpec
  *    bounds its error against the exact mode.
  *
  * min/max are cast to string so heterogeneous column types fit one
  * output schema (the cast loses nothing for the lexical compare a
  * census needs; keep typed extremes by querying the column
  * directly).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true,
              rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    require(cols.forall(c => c.matches("[A-Za-z0-9_]+")),
      s"profiled column names must be identifier-plain: $cols")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__nn_$c`, `__nd_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    one.selectExpr(
        "__rows AS n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nonnull, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
