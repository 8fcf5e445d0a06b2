package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percentile winsorization — the standard numeric-cleaning step for
  * training data (clip label/feature outliers to per-group percentile
  * bounds instead of dropping rows).
  *
  * Scale shape: ONE aggregate computes the bounds — |groups| rows,
  * broadcast back into the clip join — and the clip itself is a per-row
  * expression; the data moves once. Bounds are rounded to `boundsDp`
  * decimals BEFORE clipping so any engine re-deriving them (the DuckDB
  * oracle, a Python sibling job) makes identical clip decisions —
  * Spark's exact `percentile` and DuckDB's `quantile_cont` agree to
  * well within 4dp but not bit-for-bit. At 100 TB swap the exact
  * percentile for `approx_percentile` via `exact = false`; the operator
  * shape is unchanged (the bounds then differ from the oracle's exact
  * ones, which is why the gate runs the exact form).
  */
object Winsorize {

  /** Adds `<valueCol>_w` (clipped value) and `<valueCol>_clipped`
    * (flag) to `df`. Bounds are the [lower, upper] percentiles of
    * `valueCol` per `groupCols` group (global when empty).
    */
  def clip(df: DataFrame, valueCol: String, groupCols: Seq[String] = Nil,
           lower: Double = 0.01, upper: Double = 0.99,
           boundsDp: Int = 4, exact: Boolean = true): DataFrame = {
    require(lower >= 0 && upper <= 1 && lower < upper,
      s"need 0 <= lower < upper <= 1, got [$lower, $upper]")
    val reserved = Seq("__lo", "__hi", s"${valueCol}_w", s"${valueCol}_clipped")
    val collisions = df.columns.filter(reserved.contains)
    require(collisions.isEmpty,
      s"input columns collide with internal names: ${collisions.mkString(", ")}")
    val fn = if (exact) "percentile" else "approx_percentile"
    val bounds = df.groupBy(groupCols.map(col): _*).agg(
      round(expr(s"$fn($valueCol, $lower)"), boundsDp).as("__lo"),
      round(expr(s"$fn($valueCol, $upper)"), boundsDp).as("__hi"))
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), groupCols)
    val v = col(valueCol)
    joined
      .withColumn(s"${valueCol}_w",
        when(v < col("__lo"), col("__lo"))
          .when(v > col("__hi"), col("__hi")).otherwise(v))
      .withColumn(s"${valueCol}_clipped", v < col("__lo") || v > col("__hi"))
      .drop("__lo", "__hi")
  }
}
