package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join. The naive formulation —
  * `points JOIN intervals ON key = key AND p BETWEEN s AND e` — is a
  * theta join: Spark plans it as a per-key cross product filtered
  * late, which explodes quadratically in key group size; at 100 TB a
  * hot key melts an executor. The binned formulation turns it into an
  * EQUI join: intervals explode to the fixed-width bins they overlap,
  * a point maps to exactly ONE bin, and the join runs hash-partitioned
  * on (key, bin) with the exact range predicate applied inside the
  * join. Because a point owns a single bin, every qualifying
  * (point, interval) pair is produced exactly once — no dedup pass.
  *
  * Cost: |intervals| × (avg interval length / binWidth) exploded rows
  * (thin — interval bounds + keys only) against |points| rows; both
  * sides shuffle once. Pick `binWidth` near the typical interval
  * length so intervals explode to O(1) bins; `maxBinsPerInterval`
  * fails LOUDLY (assert_true, not silent drop) on degenerate intervals
  * that would fan out unboundedly.
  */
object RangeJoin {

  /** Join each point row to every interval row (same `keys`) whose
    * `[startCol, endCol]` contains `pointCol` (inclusive both ends).
    * The three bound columns must be integral (cast timestamps to
    * epoch micros first); point and interval column sets must not
    * collide outside `keys`.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val collisions = intervals.columns.toSeq.diff(keys)
      .intersect(points.columns.toSeq.diff(keys))
    require(collisions.isEmpty,
      s"interval columns collide with point columns: ${collisions.mkString(",")} — rename first")

    val w = lit(binWidth)
    val startBin = floor(col(startCol) / w).cast("long")
    val endBin = floor(col(endCol) / w).cast("long")
    // the guard must live INSIDE the bin expression or column pruning
    // would silently remove it: assert_true yields null when the
    // condition holds, so coalesce folds it into a no-op addend
    val guard = coalesce(
      assert_true(endBin - startBin + 1 <= maxBinsPerInterval,
        concat(lit(s"interval spans more than $maxBinsPerInterval bins of $binWidth; " +
          "raise binWidth or maxBinsPerInterval (interval length seen: "),
          (col(endCol) - col(startCol)).cast("string"), lit(")"))).cast("long"),
      lit(0L))
    val p = points.withColumn("__bin", floor(col(pointCol) / w).cast("long"))
    val i = intervals.withColumn("__bin", explode(sequence(startBin + guard, endBin)))
    p.join(i, keys :+ "__bin", "inner")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: left `[leftStart, leftEnd]` rows joined to
    * every right `[rightStart, rightEnd]` row (same `keys`) whose
    * interval OVERLAPS (inclusive bounds). Both sides explode to bins,
    * so a pair can share several bins — instead of a dedup pass, each
    * pair is emitted only from its OWNER bin (the larger of the two
    * start bins, which both sides provably occupy when they overlap):
    * exactly-once output with no distinct shuffle.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val collisions = right.columns.toSeq.diff(keys)
      .intersect(left.columns.toSeq.diff(keys))
    require(collisions.isEmpty,
      s"right columns collide with left columns: ${collisions.mkString(",")} — rename first")

    val w = lit(binWidth)
    def binned(df: DataFrame, s: String, e: String, side: String): DataFrame = {
      val sBin = floor(col(s) / w).cast("long")
      val eBin = floor(col(e) / w).cast("long")
      val guard = coalesce(
        assert_true(eBin - sBin + 1 <= maxBinsPerInterval,
          lit(s"interval spans more than $maxBinsPerInterval bins of $binWidth")).cast("long"),
        lit(0L))
      df.withColumn(s"__sbin_$side", sBin)
        .withColumn("__bin", explode(sequence(sBin + guard, eBin)))
    }
    binned(left, leftStart, leftEnd, "l")
      .join(binned(right, rightStart, rightEnd, "r"), keys :+ "__bin", "inner")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("__bin") === greatest(col("__sbin_l"), col("__sbin_r")))
      .drop("__bin", "__sbin_l", "__sbin_r")
  }
}
