package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join: match each left row with the nearest right
  * row per key — backward (latest right with `rightTs <= leftTs`, the
  * trade/quote classic) or forward (earliest right with
  * `rightTs >= leftTs`). The reference has no as-of operator (its CDC
  * merge J1 is the closest theta-shape, SURVEY.md §2.5
  * /root/reference/lib/ingestors.py:123); this generalizes the same
  * key+timestamp resolution to a first-class join.
  *
  * Spark-first plan — the union-window formulation, NOT a range join:
  * tag both sides, union, ONE shuffle on the keys, one sort on
  * (ts, side, tiebreak), and a running `last(ignoreNulls)` carries the
  * most recent right-side payload forward to each left row. Cost is
  * O((|L|+|R|) log) with no pair explosion — a theta-join
  * (`l.key = r.key AND r.ts <= l.ts` + top-1) would expand every key
  * group quadratically before filtering, which at 100 TB is the
  * difference between one shuffle and an unbounded intermediate. Both
  * sides shuffle ONCE on the join keys regardless of row count; skewed
  * keys degrade to a single sorted partition per key, the same failure
  * shape as any keyed window — [[backwardBucketed]]/[[forwardBucketed]]
  * are the result-identical time-bucketed remedy when a key dominates.
  *
  * Right-side payload columns ride in ONE struct so `last(_,
  * ignoreNulls=true)` treats a matched-but-null field as matched (a
  * per-column `last` would reach further back for each null field
  * independently — wrong row semantics).
  */
object AsOfJoin {

  /** Backward as-of: latest right row with `rightTs <= leftTs` per key.
    *
    * @param keys          equi-join key columns (present on both sides)
    * @param leftTs        left ordering column name
    * @param rightTs       right ordering column name (same type)
    * @param rightTiebreak numeric column (cast to long) breaking ties
    *                      among right rows sharing (keys, ts): highest
    *                      wins for backward, lowest for forward —
    *                      deterministic output when (keys, rightTs) is
    *                      not unique
    * @param tolerance     max lookback as a SQL interval string
    *                      (e.g. "1 hour", timestamp columns only);
    *                      matches further back are nulled out
    * @param matchedTsCol  when set, emit the matched right timestamp
    *                      under this name
    * @return left columns + right payload columns (right minus keys
    *         and rightTs), null where no right row qualifies
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightTiebreak: Option[String] = None,
               tolerance: Option[String] = None,
               matchedTsCol: Option[String] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, rightTiebreak, tolerance,
      matchedTsCol, forward = false)

  /** Forward as-of: earliest right row with `rightTs >= leftTs`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              rightTiebreak: Option[String] = None,
              tolerance: Option[String] = None,
              matchedTsCol: Option[String] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, rightTiebreak, tolerance,
      matchedTsCol, forward = true)

  /** Skew-resistant backward as-of (timestamp columns): the remedy the
    * plain form's scaladoc prescribes for a dominating key, made
    * concrete. Windows partition by (keys, time-bucket) — a hot key's
    * rows spread across `ceil(span / bucketWidthMicros)` partitions
    * instead of serializing into one — and cross-bucket matches are
    * restored EXACTLY by a carry table: the best right row per
    * (key, bucket) (one row per pair, tiny) gets a running
    * carry-forward window ordered by bucket, left-joined back so a left
    * row with no in-bucket match inherits the latest right row from any
    * earlier bucket, across any run of empty buckets. Result is
    * row-identical to [[backward]] (AsOfJoinSpec asserts equality under
    * heavy skew); the price is two extra thin shuffles (bucket summary
    * + carry join), worth paying only when a key dominates. MEASURED
    * (`Test/runMain graft.DevSkew`, local[32], 4M trades + 400k quotes,
    * 95% of rows on one key, 24h span / 1h buckets): plain 12.2 s vs
    * bucketed 3.2 s — 3.8×, identical payload hashes; on uniform keys
    * the plain form wins (one shuffle vs three).
    */
  def backwardBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       bucketWidthMicros: Long,
                       rightTiebreak: Option[String] = None,
                       tolerance: Option[String] = None,
                       matchedTsCol: Option[String] = None): DataFrame =
    joinBucketed(left, right, keys, leftTs, rightTs, bucketWidthMicros,
      rightTiebreak, tolerance, matchedTsCol, forward = false)

  /** Skew-resistant forward as-of — see [[backwardBucketed]]. */
  def forwardBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      bucketWidthMicros: Long,
                      rightTiebreak: Option[String] = None,
                      tolerance: Option[String] = None,
                      matchedTsCol: Option[String] = None): DataFrame =
    joinBucketed(left, right, keys, leftTs, rightTs, bucketWidthMicros,
      rightTiebreak, tolerance, matchedTsCol, forward = true)

  /** Validated side preparation shared by both formulations: tagged,
    * normalized frames plus the right payload column list and the left
    * side's sort tag.
    */
  private def prep(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightTiebreak: Option[String],
                   matchedTsCol: Option[String],
                   forward: Boolean): (DataFrame, DataFrame, Seq[String], Int) = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val missingL = (keys :+ leftTs).filterNot(left.columns.contains)
    require(missingL.isEmpty, s"left side lacks column(s): ${missingL.mkString(",")}")
    val missingR = ((keys :+ rightTs) ++ rightTiebreak).filterNot(right.columns.contains)
    require(missingR.isEmpty, s"right side lacks column(s): ${missingR.mkString(",")}")

    val payload = right.columns.toSeq.diff(keys :+ rightTs)
    val collisions = payload.intersect(left.columns.toSeq) ++
      matchedTsCol.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"right payload collides with left column(s): ${collisions.mkString(",")} — rename first")
    // the internal working columns below would silently overwrite a
    // same-named input column — fail as loudly as payload collisions do
    val reserved = Seq("__ts", "__side", "__tie", "__rv", "__mts", "__m",
      "__bkt", "__rvb", "__carry")
    val reservedHits =
      (left.columns.toSeq ++ right.columns.toSeq).distinct.intersect(reserved)
    require(reservedHits.isEmpty,
      s"column name(s) reserved by AsOfJoin: ${reservedHits.mkString(",")} — rename first")

    // tag sides so that, at equal ts, right rows sort INSIDE the frame:
    // before left for backward (<=), after left for forward (>=)
    val (rightTag, leftTag) = if (forward) (1, 0) else (0, 1)
    val rv = struct(col(rightTs).as("__mts") +: payload.map(col): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(rightTag).as("__side"),
        rightTiebreak.map(col).getOrElse(lit(0L)).cast("long").as("__tie"),
        rv.as("__rv")): _*)
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftTag))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__rv", lit(null).cast(r2.schema("__rv").dataType))
    (l2, r2, payload, leftTag)
  }

  /** Tolerance gate + output projection shared by both formulations —
    * expects a frame of left columns plus `__ts` and the matched `__m`.
    */
  private def finish(annotated: DataFrame, left: DataFrame,
                     payload: Seq[String], tolerance: Option[String],
                     matchedTsCol: Option[String],
                     forward: Boolean): DataFrame = {
    val m = col("__m")
    val gated = tolerance match {
      case None => m
      case Some(t) =>
        val bound = expr(s"INTERVAL '$t'")
        val ok =
          if (forward) m.getField("__mts") <= col("__ts") + bound
          else m.getField("__mts") >= col("__ts") - bound
        when(ok, m)
    }
    val out = left.columns.toSeq.map(col) ++
      matchedTsCol.map(n => gated.getField("__mts").as(n)) ++
      payload.map(p => gated.getField(p).as(p))
    annotated.select(out: _*)
  }

  private def matchedOver(w: org.apache.spark.sql.expressions.WindowSpec,
                          forward: Boolean): Column =
    // ascending tiebreak serves both directions: backward's last()
    // lands on the HIGHEST tiebreak (nearest the frame end), forward's
    // first() on the LOWEST (nearest the frame start)
    if (forward)
      first(col("__rv"), ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    else
      last(col("__rv"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightTiebreak: Option[String],
                   tolerance: Option[String],
                   matchedTsCol: Option[String],
                   forward: Boolean): DataFrame = {
    val (l2, r2, payload, leftTag) =
      prep(left, right, keys, leftTs, rightTs, rightTiebreak, matchedTsCol, forward)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
    // the window must see BOTH sides: annotate the union first, filter
    // left rows after, and only then apply the per-row tolerance gate
    val annotated = l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__m", matchedOver(w, forward))
      .filter(col("__side") === leftTag)
    finish(annotated, left, payload, tolerance, matchedTsCol, forward)
  }

  private def joinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                           leftTs: String, rightTs: String,
                           bucketWidthMicros: Long,
                           rightTiebreak: Option[String],
                           tolerance: Option[String],
                           matchedTsCol: Option[String],
                           forward: Boolean): DataFrame = {
    require(bucketWidthMicros > 0,
      s"bucket width must be positive: $bucketWidthMicros")
    val (l2, r2, payload, leftTag) =
      prep(left, right, keys, leftTs, rightTs, rightTiebreak, matchedTsCol, forward)
    val bkt = floor(unix_micros(col("__ts")) / lit(bucketWidthMicros))
    val l3 = l2.withColumn("__bkt", bkt)
    val r3 = r2.withColumn("__bkt", bkt)
    val keyBkt = keys :+ "__bkt"

    // pass 1 — within-bucket: the plain union-window, but partitioned
    // by (keys, bucket) so a hot key parallelizes across buckets
    val w = Window.partitionBy(keyBkt.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
    val within = l3.unionByName(r3, allowMissingColumns = true)
      .withColumn("__m", matchedOver(w, forward))
      .filter(col("__side") === leftTag)

    // pass 2 — carry: best right row per (key, bucket), ONE row per
    // pair, then a running carry across buckets (this per-key window
    // ranges over bucket COUNTS, not row counts — always tiny). Bucket
    // ids from BOTH sides so runs of right-empty buckets still inherit.
    val rvOrd = struct(col("__ts"), col("__tie"))
    val best = if (forward) min_by(col("__rv"), rvOrd) else max_by(col("__rv"), rvOrd)
    val perBucket = r3.groupBy(keyBkt.map(col): _*).agg(best.as("__rvb"))
    val buckets = l3.select(keyBkt.map(col): _*)
      .unionByName(r3.select(keyBkt.map(col): _*)).distinct()
    val cw = Window.partitionBy(keys.map(col): _*).orderBy(col("__bkt").asc)
    val carryExpr =
      if (forward)
        first(col("__rvb"), ignoreNulls = true)
          .over(cw.rowsBetween(1, Window.unboundedFollowing))
      else
        last(col("__rvb"), ignoreNulls = true)
          .over(cw.rowsBetween(Window.unboundedPreceding, -1))
    val carry = buckets.join(perBucket, keyBkt, "left")
      .select(keyBkt.map(col) :+ carryExpr.as("__carry"): _*)

    val combined = within.join(carry, keyBkt, "left")
      .withColumn("__m", coalesce(col("__m"), col("__carry")))
    finish(combined, left, payload, tolerance, matchedTsCol, forward)
  }
}
