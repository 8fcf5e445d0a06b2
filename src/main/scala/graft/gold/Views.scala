package graft.gold

import org.apache.spark.sql.SparkSession

import graft.catalog.{TableRef, Warehouse}
import graft.sql.Transform

/** Gold-layer materialized views (SURVEY.md §2.2 K5). The reference
  * declares `CREATE MATERIALIZED VIEW gold.brapi.prices AS SELECT ...`
  * via Databricks DLT (/root/reference/Pipelines/Test/transformations/
  * test.sql:1-15); the OSS equivalent is CTAS into the warehouse,
  * refreshed by the job runner on each run. The view body may reference
  * warehouse tables by three-part name and use QUALIFY — it goes through
  * the same Transform pipeline as silver queries.
  */
object Views {

  /** Strip a leading `CREATE [OR REPLACE] MATERIALIZED VIEW x AS`
    * header if present, so reference-shaped view files run verbatim.
    */
  private[gold] def bodyOf(sql: String): String = {
    val p = java.util.regex.Pattern.compile(
      """^\s*CREATE\s+(OR\s+REPLACE\s+)?(MATERIALIZED\s+)?VIEW\s+\S+\s+AS\s+""",
      java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.DOTALL)
    val m = p.matcher(sql)
    if (m.find() && m.start() == 0) sql.substring(m.end()) else sql
  }

  /** Materialize (create-or-refresh) a gold view into the warehouse.
    * With `pinBase`, the CTAS reads that base table at its PINNED
    * current version and records it atomically in the commit meta
    * (`mv.base_version`) — what [[refreshIncrementalAuto]] later reads,
    * and the same race-free discipline as [[materializeAgg]]: a base
    * commit arriving mid-build cannot leave contents ahead of the
    * recorded marker. Returns the pinned base version (-1 when
    * unpinned).
    */
  def materialize(spark: SparkSession, warehouse: Warehouse, ref: TableRef,
                  viewSql: String, pinBase: Option[TableRef] = None,
                  asOf: Option[Long] = None): Long = {
    val tables = warehouse.listTables().map { t =>
      t.toString -> warehouse.registerView(t)
    }.toMap
    pinBase match {
      case None =>
        require(asOf.isEmpty, "asOf requires pinBase (which table's version?)")
        warehouse.overwrite(ref, Transform.sql(spark, bodyOf(viewSql), tables))
        -1L
      case Some(b) =>
        // asOf = CTAS AS OF: build the view from a historical base
        // version (still on disk until vacuum) — the marker then makes
        // the next incremental refresh replay exactly v..current
        val v = asOf.orElse(warehouse.currentVersion(b)).getOrElse(
          throw new IllegalArgumentException(s"$b has no committed version"))
        val pv = s"__graft_pin_${b.catalog}_${b.schema}_${b.table}"
        warehouse.readVersion(b, v).createOrReplaceTempView(pv)
        // dropped after the CTAS consumes it: a session-lingering view
        // over a historical version would resolve to vacuumed files
        try warehouse.overwrite(ref,
          Transform.sql(spark, bodyOf(viewSql), tables + (b.toString -> pv)),
          meta = Map(BaseVersionMeta -> v.toString))
        finally spark.catalog.dropTempView(pv)
        v
    }
  }

  /** Incrementally refresh a latest-per-key materialized view from the
    * base table's change feed instead of a full recompute: only the
    * view partitions whose `viewKeys` appear among rows changed since
    * `sinceVersion` are re-derived (from the base restricted to those
    * partitions — a broadcast semi join, so untouched partitions never
    * scan) and PARTITION-REPLACED into the view
    * ([[graft.sinks.MergeTable.replacePartitions]]). Returns the base
    * version the view now reflects; pass it back as the next
    * `sinceVersion`.
    *
    * Deletes and partition moves are handled by tombstoning, not
    * refused: the feed's `update_pre` and `delete` rows carry
    * before-images, so a changed row marks BOTH its old and new view
    * partition affected; every affected partition is recomputed from
    * the current base, and one left with no base rows simply has no
    * replacement rows — the partition replace empties it instead of
    * leaving a stale latest row.
    *
    * Contract: the view body must be per-`viewKeys`-partition-local
    * (the QUALIFY latest-per-key family — each output row depends only
    * on base rows sharing its partition key).
    */
  /** @param feedFor multi-view feed sharing: invoked with the exact
    *        `(sinceVersion, currentVersion)` range this refresh needs;
    *        a `Some` frame MUST be that range's [[Warehouse.changeFeed]]
    *        (typically computed once and handed to each of N views
    *        maintained over one base — N refreshes per cycle then cost
    *        ONE feed scan, the medallion fan-out shape). `None` (the
    *        default) computes the feed locally. Sound to share because
    *        committed versions are immutable: a range's row-level diff
    *        never changes.
    */
  def refreshIncremental(spark: SparkSession, warehouse: Warehouse,
                         viewRef: TableRef, baseRef: TableRef,
                         sinceVersion: Long, viewSql: String,
                         viewKeys: Seq[String], baseKeys: Seq[String],
                         feedFor: (Long, Long) => Option[org.apache.spark.sql.DataFrame] =
                           (_, _) => None): Long = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import graft.util.PhaseTimer.time
    val cur = warehouse.currentVersion(baseRef).getOrElse(
      throw new IllegalArgumentException(s"$baseRef has no committed version"))
    if (cur == sinceVersion) return cur
    // distinct partition keys over EVERY image in the feed (pre + post
    // + delete); materialized once — it feeds the recompute slice, the
    // partition replace, and its pruning bounds
    val affected = time("mvrefresh.feed") {
      feedFor(sinceVersion, cur)
        .getOrElse(warehouse.changeFeed(baseRef, sinceVersion, cur, baseKeys))
        .select(viewKeys.map(col): _*).distinct().localCheckpoint()
    }
    val recomputed = time("mvrefresh.plan") {
      val body = bodyOf(viewSql)
      // register only the tables the body can actually reference (the
      // base is overridden by the slice below) — registerView opens the
      // table, and a warehouse can hold hundreds of them
      def referenced(t: TableRef): Boolean =
        body.contains(t.toString) ||
          body.contains(s"`${t.catalog}`.`${t.schema}`.`${t.table}`")
      val tables = warehouse.listTables()
        .filter(t => t != baseRef && referenced(t)).map { t =>
          t.toString -> warehouse.registerView(t)
        }.toMap
      // the view body reads the base by three-part name — point that name
      // at the affected-partition slice instead of the full table
      val slice = warehouse.read(baseRef)
        .join(broadcast(affected), viewKeys, "left_semi")
      val sliceView = s"__graft_incr_${baseRef.catalog}_${baseRef.schema}_${baseRef.table}"
      slice.createOrReplaceTempView(sliceView)
      Transform.sql(spark, bodyOf(viewSql),
        tables + (baseRef.toString -> sliceView))
    }
    try {
      time("mvrefresh.replace") {
        new graft.sinks.MergeTable(spark, warehouse, viewRef, viewKeys, None)
          .replacePartitions(affected, recomputed,
            meta = Map(BaseVersionMeta -> cur.toString))
      }
    } finally {
      // the replace is committed (or threw) — the affected-keys
      // checkpoint is dead either way; without this every refresh
      // leaked its blocks for the JVM's life
      graft.util.Scratch.release(affected)
      // the slice view resolved into `recomputed`'s plan at analysis
      // time; a lingering catalog entry would dangle once the feed's
      // versions vacuum away — dropped on the failure path too (the
      // pinned materialize path guards its cleanup the same way)
      spark.catalog.dropTempView(
        s"__graft_incr_${baseRef.catalog}_${baseRef.schema}_${baseRef.table}")
    }
    cur
  }

  /** [[refreshIncremental]] with `sinceVersion` read from the view's
    * own commit meta (written by [[materialize]] and every refresh) —
    * the same crash-safe auto form as [[refreshIncrementalAggAuto]]:
    * a replayed batch re-covers exactly the feed the view is missing,
    * and a rerun of an already-covered refresh no-ops instead of
    * re-replacing identical partitions.
    */
  def refreshIncrementalAuto(spark: SparkSession, warehouse: Warehouse,
                             viewRef: TableRef, baseRef: TableRef,
                             viewSql: String, viewKeys: Seq[String],
                             baseKeys: Seq[String],
                             feedFor: (Long, Long) => Option[org.apache.spark.sql.DataFrame] =
                               (_, _) => None): Long = {
    val since = warehouse.latestCommitMeta(viewRef, BaseVersionMeta).getOrElse(
      throw new IllegalArgumentException(
        s"$viewRef carries no $BaseVersionMeta commit meta — materialize " +
          "it first")).toLong
    refreshIncremental(spark, warehouse, viewRef, baseRef, since, viewSql,
      viewKeys, baseKeys, feedFor)
  }

  /** One aggregate column of an aggregate materialized view:
    * `out` = output column name, `func` ∈ sum | count | min | max
    * (distributive — maintenance merges deltas directly) | avg
    * (ALGEBRAIC — maintained through its (sum, non-null count)
    * decomposition: the view physically stores `__avg_sum_<out>` and
    * `__avg_cnt_<out>` beside the derived `out`, each component merges
    * like any sum, and `out = sum / cnt` is re-derived after every
    * merge; a group whose measures are all NULL keeps a NULL avg,
    * exactly like a full recompute) | approx_ndv (SKETCH-ALGEBRAIC —
    * maintained through a stored per-group HLL sketch binary
    * `__ndv_sk_<out>`: insert deltas union in via `hll_union` exactly
    * like the AVG components merge as sums, and `out` re-derives as
    * `hll_sketch_estimate` after every merge. Sketches cannot retract
    * — a delete/update_pre in a group routes it through the dirty-
    * group base-slice recompute, precisely MIN/MAX's contract. The
    * union path is estimate-identical to a one-shot recompute: HLL
    * coupon/register state depends only on the SET of hashed values,
    * and union-of-subsets covers the same set). `in` = base column
    * aggregated (ignored for count).
    */
  final case class AggSpec(out: String, func: String, in: String = "")

  private val aggFuncs = Set("sum", "count", "min", "max", "avg", "approx_ndv")

  /** Physical column of the stored view: AggSpec minus `avg`, plus the
    * component funcs `countcol` (non-null count of `in` — avg's
    * denominator) that AggSpec doesn't expose directly.
    */
  private final case class Phys(out: String, func: String, in: String = "")

  private def avgSumCol(out: String) = s"__avg_sum_$out"
  private def avgCntCol(out: String) = s"__avg_cnt_$out"
  private def ndvSkCol(out: String) = s"__ndv_sk_$out"

  /** Declared aggs → (physical columns to store/merge, derived
    * columns re-computed from them after every merge). Non-avg specs
    * pass through; each avg expands to its two components plus the
    * derived quotient. Component division: both sides are exact
    * (integer sums never lose bits; float sums share the FP caveat of
    * any delta-merged SUM), and Spark's `/` on the components is one
    * double division — the same arithmetic a full-recompute AVG does.
    */
  private def expand(aggs: Seq[AggSpec])
      : (Seq[Phys], Seq[(String, org.apache.spark.sql.Column)]) = {
    import org.apache.spark.sql.functions.{col, hll_sketch_estimate, lit, when}
    val phys = Seq.newBuilder[Phys]
    val derived = Seq.newBuilder[(String, org.apache.spark.sql.Column)]
    aggs.foreach {
      case AggSpec(out, "avg", in) =>
        phys += Phys(avgSumCol(out), "sum", in)
        phys += Phys(avgCntCol(out), "countcol", in)
        derived += out -> (col(avgSumCol(out)) / col(avgCntCol(out)))
      case AggSpec(out, "approx_ndv", in) =>
        phys += Phys(ndvSkCol(out), "hllsketch", in)
        // all-NULL (or empty) groups carry a NULL sketch; their NDV is
        // 0, the approx_count_distinct convention
        derived += out -> when(col(ndvSkCol(out)).isNull, lit(0L))
          .otherwise(hll_sketch_estimate(col(ndvSkCol(out))))
      case AggSpec(out, f, in) => phys += Phys(out, f, in)
    }
    (phys.result(), derived.result())
  }

  /** Stored-view column order: group keys, declared outputs (avg in
    * its declared place), then the avg component columns.
    */
  private def viewColumns(groupKeys: Seq[String], aggs: Seq[AggSpec])
      : Seq[String] =
    groupKeys ++ aggs.map(_.out) ++
      aggs.collect { case AggSpec(out, "avg", _) =>
        Seq(avgSumCol(out), avgCntCol(out)) }.flatten ++
      aggs.collect { case AggSpec(out, "approx_ndv", _) => ndvSkCol(out) }

  private def aggColumn(a: Phys): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, count, hll_sketch_agg, lit, max, min, sum}
    (a.func match {
      case "sum"       => sum(col(a.in))
      case "count"     => count(lit(1))
      case "countcol"  => count(col(a.in))
      case "min"       => min(col(a.in))
      case "max"       => max(col(a.in))
      case "hllsketch" => hll_sketch_agg(col(a.in))
    }).as(a.out)
  }

  private def aggPlan(base: org.apache.spark.sql.DataFrame,
                      groupKeys: Seq[String],
                      aggs: Seq[AggSpec]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val (phys, derived) = expand(aggs)
    val p = base.groupBy(groupKeys.map(col): _*)
      .agg(aggColumn(phys.head), phys.tail.map(aggColumn): _*)
    derived.foldLeft(p) { case (df, (name, c)) => df.withColumn(name, c) }
      .select(viewColumns(groupKeys, aggs).map(col): _*)
  }

  /** The commit-meta key recording which base version an MV's contents
    * reflect. Written ATOMICALLY with every materialize/refresh commit —
    * the property that makes the non-idempotent delta refresh
    * crash-safe: a replayed batch reads the marker back and re-covers
    * exactly the missed feed (or no-ops if the refresh had committed).
    */
  val BaseVersionMeta = "mv.base_version"

  /** CTAS an aggregate MV (`SELECT keys, agg(...) GROUP BY keys`) —
    * the declaration [[refreshIncrementalAgg]] later maintains. The
    * spec list IS the view definition: keeping it structured (instead
    * of SQL) is what lets the refresher derive the delta-merge
    * arithmetic per column. Returns the pinned base version the view
    * reflects (also recorded in the commit meta).
    */
  def materializeAgg(spark: SparkSession, warehouse: Warehouse,
                     viewRef: TableRef, baseRef: TableRef,
                     groupKeys: Seq[String], aggs: Seq[AggSpec],
                     asOf: Option[Long] = None): Long = {
    validate(groupKeys, aggs)
    // asOf = CTAS AS OF a historical base version (see materialize)
    val v = asOf.orElse(warehouse.currentVersion(baseRef)).getOrElse(
      throw new IllegalArgumentException(s"$baseRef has no committed version"))
    // CTAS from the PINNED version the marker claims, not whatever is
    // current at scan time — a base commit racing the build would
    // otherwise leave contents ahead of the recorded version and the
    // next incremental refresh would double-apply its feed
    // group-key stats + range clustering from the first write:
    // refreshIncrementalAgg's readPruned(view) needs a manifest to
    // skip files, and skipping only bites when per-file key intervals
    // are disjoint — a hash-shuffled aggregate output overlaps every
    // file with every range. (Refresh deltas are small and overlap by
    // nature; compaction folds them back into the clustered body.)
    val plan = aggPlan(warehouse.readVersion(baseRef, v), groupKeys, aggs)
    val clustered = groupKeys match {
      case Seq(k) => plan.repartitionByRange(
        org.apache.spark.sql.functions.col(k))
      case _ => plan
    }
    warehouse.overwrite(viewRef, clustered,
      statsColumns = groupKeys,
      meta = Map(BaseVersionMeta -> v.toString))
    v
  }

  /** [[refreshIncrementalAgg]] with `sinceVersion` read from the
    * view's own commit meta — the crash-safe form a streaming loop
    * uses: the marker travels atomically with each refresh commit, so
    * a batch replayed after a crash re-covers exactly the feed the
    * view is missing, and a replay of an already-refreshed batch
    * no-ops.
    */
  def refreshIncrementalAggAuto(spark: SparkSession, warehouse: Warehouse,
                                viewRef: TableRef, baseRef: TableRef,
                                groupKeys: Seq[String], aggs: Seq[AggSpec],
                                baseKeys: Seq[String],
                                feedFor: (Long, Long) => Option[org.apache.spark.sql.DataFrame] =
                                  (_, _) => None): Long = {
    val since = warehouse.latestCommitMeta(viewRef, BaseVersionMeta).getOrElse(
      throw new IllegalArgumentException(
        s"$viewRef carries no $BaseVersionMeta commit meta — materialize " +
          "it with materializeAgg first")).toLong
    refreshIncrementalAgg(spark, warehouse, viewRef, baseRef, since,
      groupKeys, aggs, baseKeys, feedFor)
  }

  private def validate(groupKeys: Seq[String], aggs: Seq[AggSpec]): Unit = {
    require(groupKeys.nonEmpty, "aggregate view needs group keys")
    require(aggs.nonEmpty, "aggregate view needs at least one aggregate")
    aggs.foreach(a => require(aggFuncs(a.func),
      s"unsupported aggregate '${a.func}' (supported: $aggFuncs)"))
    require(aggs.exists(_.func == "count"),
      "aggregate view must declare a count column: incremental refresh " +
        "needs the group's row count to drop groups deletes have emptied")
    require(aggs.map(_.out).distinct.size == aggs.size,
      s"duplicate output columns in ${aggs.map(_.out)}")
    aggs.foreach(a => require(!a.out.startsWith("__avg_"),
      s"output '${a.out}' collides with the avg component namespace"))
    aggs.foreach(a => require(!a.out.startsWith("__ndv_"),
      s"output '${a.out}' collides with the NDV sketch namespace"))
    aggs.filter(a => a.func != "count").foreach(a =>
      require(a.in.nonEmpty, s"aggregate '${a.out}' (${a.func}) needs an " +
        "input column"))
  }

  /** Incrementally refresh an AGGREGATE materialized view from the
    * base change feed — the reporting-view analogue of
    * [[refreshIncremental]]'s latest-per-key family, and strictly
    * cheaper than its recompute-affected-groups strategy where the
    * arithmetic allows:
    *
    *  - SUM / COUNT merge pure per-group DELTAS (post-images add,
    *    pre-images and deletes subtract) — the base table is NOT
    *    rescanned, so a group with a billion rows and a one-row update
    *    costs one feed row, not a billion-row re-aggregation.
    *  - MIN / MAX merge deltas for groups the feed only INSERTED into
    *    (`min' = least(min, Δmin)`); a group with any retraction is
    *    recomputed from its base slice (a deleted row may have carried
    *    the extremum — retractable MIN/MAX needs full multiplicity
    *    state, which is the full group anyway).
    *  - A group whose merged count reaches 0 is dropped from the view
    *    (tombstoned by the partition replace).
    *
    * The view must have been created by [[materializeAgg]] with the
    * SAME groupKeys/aggs. FP caveat shared with every delta-merged
    * IVM: SUM over floating-point columns accumulates in a different
    * association order than a full recompute — use integer-typed
    * measures (e.g. bigint cents) where bit-equality matters.
    * Returns the base version the view now reflects.
    *
    * Concurrency contract: ONE refresher per view. The writer lock and
    * the conflict retry keep concurrent commits physically safe, but a
    * second refresher that planned against the same marker re-applies
    * the same deltas on top of the first's committed result — delta
    * merge is not idempotent. Serialize refreshes per view (the
    * streaming loop does so naturally; a batch backfill must not race
    * it) — the same semantic-serialization contract Delta documents
    * for concurrent MERGE.
    *
    * `feedFor` shares one feed scan across N views maintained over one
    * base — see [[refreshIncremental]]'s param doc.
    */
  def refreshIncrementalAgg(spark: SparkSession, warehouse: Warehouse,
                            viewRef: TableRef, baseRef: TableRef,
                            sinceVersion: Long, groupKeys: Seq[String],
                            aggs: Seq[AggSpec],
                            baseKeys: Seq[String],
                            feedFor: (Long, Long) => Option[org.apache.spark.sql.DataFrame] =
                              (_, _) => None): Long = {
    import org.apache.spark.sql.functions._
    import graft.util.PhaseTimer.time
    validate(groupKeys, aggs)
    val cur = warehouse.currentVersion(baseRef).getOrElse(
      throw new IllegalArgumentException(s"$baseRef has no committed version"))
    if (cur == sinceVersion) return cur
    val (phys, derived) = expand(aggs)
    val isPost = col("_change_type").isin("insert", "update_post")
    val sign = when(isPost, lit(1L)).otherwise(lit(-1L))
    val deltaCols = phys.map { a =>
      a.func match {
        case "count"    => sum(sign).as(a.out)
        // avg's denominator: only rows whose measure is non-NULL count,
        // signed like any retractable component
        case "countcol" =>
          sum(when(col(a.in).isNotNull, sign).otherwise(lit(0L))).as(a.out)
        case "sum"      => sum(sign * col(a.in)).as(a.out)
        // retraction-free groups only consume these (see __retract)
        case "min"       => min(when(isPost, col(a.in))).as(a.out)
        case "max"       => max(when(isPost, col(a.in))).as(a.out)
        case "hllsketch" => hll_sketch_agg(when(isPost, col(a.in))).as(a.out)
      }
    } :+ max(when(sign < 0, lit(1)).otherwise(lit(0))).as("__retract")
    // one feed pass → one thin (group, deltas) frame; materialized
    // because it feeds the merge, the dirty set, AND the replace bounds
    val deltas = time("mvagg.feed") {
      feedFor(sinceVersion, cur)
        .getOrElse(warehouse.changeFeed(baseRef, sinceVersion, cur, baseKeys))
        .groupBy(groupKeys.map(col): _*)
        .agg(deltaCols.head, deltaCols.tail: _*)
        .localCheckpoint()
    }
    // funcs that cannot retract (MIN/MAX lose the evicted value, HLL
    // sketches cannot subtract): any retraction-touched group routes
    // through the dirty-group base-slice recompute instead of merging
    val needsMM = phys.exists(a =>
      a.func == "min" || a.func == "max" || a.func == "hllsketch")
    val countOut = aggs.find(_.func == "count").get.out
    // Single-column group keys additionally FILE-PRUNE the view and
    // base scans by the deltas' key range (one 1-row driver agg off the
    // checkpointed deltas): at 1e9 groups a 100-group delta must not
    // read the whole view, let alone shuffle it. readPruned falls back
    // to a full scan when the table has no manifest for the column;
    // a delta batch containing a NULL group key disables the prune
    // (file stats describe non-null values only, so a range could
    // wrongly drop the file holding the null group's current row).
    def pruned(ref: TableRef,
               reader: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      groupKeys match {
        case Seq(k) =>
          val b = deltas.agg(min(col(k)), max(col(k)),
            count(lit(1)) - count(col(k))).head()
          if (b.isNullAt(0) || b.getLong(2) > 0) reader
          else warehouse.readPruned(ref, k, b.get(0), b.get(1))
        case _ => reader
      }
    val replacement = time("mvagg.plan") {
      val mergeable =
        if (needsMM) deltas.filter(col("__retract") === 0) else deltas
      val curView = pruned(viewRef, warehouse.read(viewRef))
      // null-safe join: a NULL group key is a legitimate group and must
      // find its current view row (usingColumns equality would not)
      val joinCond = groupKeys.map(k => col(s"d.$k") <=> col(s"c.$k"))
        .reduce(_ && _)
      val mergedPhys = mergeable.as("d")
        .join(curView.as("c"), joinCond, "left")
        .select(groupKeys.map(k => col(s"d.$k").as(k)) ++ phys.map { a =>
          val (c, d) = (col(s"c.${a.out}"), col(s"d.${a.out}"))
          (a.func match {
            // count deltas (row count and non-null count) are never NULL
            case "count" | "countcol" => coalesce(c + d, d)
            // SUM's delta IS NULL when the feed rows for the group all
            // carry NULL measures (SQL SUM skips NULLs) — c must survive
            // that, and a new group whose inserts are all-NULL must stay
            // NULL like a full recompute would: c+d, else c, else d
            case "sum"   => coalesce(c + d, c, d)
            case "min"   => least(c, d)
            case "max"   => greatest(c, d)
            // insert-only sketch merge: union when both sides exist
            // (hll_union is NULL-intolerant); a NULL side means "no
            // non-null values seen there" and the other side carries
            // the group's whole state — estimate-identical to a
            // one-shot recompute because HLL state depends only on
            // the hashed-value SET, and union-of-subsets covers it
            case "hllsketch" =>
              when(c.isNull, d).when(d.isNull, c).otherwise(hll_union(c, d))
          }).as(a.out)
        }: _*)
        .filter(col(countOut) > 0)
      // avg component normalization BEFORE deriving: when retractions
      // take a surviving group's non-null count to 0, the summed
      // component is arithmetically 0 but a full recompute (SUM over
      // no non-null rows) is NULL — the components are part of the
      // stored, value-checked state, so they must match recompute
      // exactly, not just the derived quotient
      val normalized = aggs.collect { case AggSpec(out, "avg", _) => out }
        .foldLeft(mergedPhys) { (df, out) =>
          df.withColumn(avgSumCol(out),
            when(col(avgCntCol(out)) === 0, lit(null))
              .otherwise(col(avgSumCol(out))))
        }
      // avg re-derives from its merged components — the only
      // non-physical columns in the stored view
      val merged = derived.foldLeft(normalized) {
          case (df, (name, c)) => df.withColumn(name, c)
        }.select(viewColumns(groupKeys, aggs).map(col): _*)
      if (!needsMM) merged
      else {
        // retraction-touched groups: re-aggregate their base slice
        // (broadcast semi join — untouched groups never scan)
        val dirty = deltas.filter(col("__retract") === 1)
          .select(groupKeys.map(k => col(k).as("__dk_" + k)): _*)
        // null-safe semi join, like the merge path: a NULL group key
        // whose rows were retracted still has survivors in the base —
        // usingColumns equality would match nothing and tombstone the
        // group without replacement
        val recomputed = aggPlan(
          pruned(baseRef, warehouse.read(baseRef))
            .join(broadcast(dirty),
              groupKeys.map(k => col(k) <=> col("__dk_" + k)).reduce(_ && _),
              "left_semi"),
          groupKeys, aggs)
        merged.unionByName(recomputed)
      }
    }
    val affected = deltas.select(groupKeys.map(col): _*)
    time("mvagg.replace") {
      if (deltas.isEmpty)
        // all feed rows cancelled (e.g. the base was only compacted):
        // no data to replace, but the marker must still advance or a
        // streaming loop would re-diff an ever-growing version range
        warehouse.commitMetaOnly(viewRef,
          Map(BaseVersionMeta -> cur.toString))
      else
        new graft.sinks.MergeTable(spark, warehouse, viewRef, groupKeys, None)
          .replacePartitions(affected, replacement,
            meta = Map(BaseVersionMeta -> cur.toString))
    }
    graft.util.Scratch.release(deltas)
    cur
  }
}
