package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Generalized analytics beyond the reference's own surface (its only
  * window op is W1/W2 row_number, SURVEY.md §2.6; no percentiles,
  * pivot, or as-of anywhere): the full analytic-window family, exact
  * percentiles, pivot/unpivot reshapes, as-of joins, and per-class
  * embedding pooling — each value-checked against DuckDB.
  *
  * Determinism discipline: running/windowed SUMs are computed over
  * bigint cents (`round(price*100)`) — floating-point running sums
  * associate differently across engines (DuckDB uses segment trees for
  * sliding frames), so exact integer math is the only hash-stable
  * formulation. Raw column passthroughs stay untouched doubles.
  */
object AnalyticQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------- as-of

  /** Backward as-of join on the events stream: each click matched with
    * the user's latest purchase at or before it (the trade/quote
    * pattern). The right side is pre-aggregated to one row per
    * (user_id, ts) so the match is deterministic under ties.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"value").as("purchase_value"))
    AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts", "ts",
        matchedTsCol = Some("purchase_ts"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"purchase_value", unix_micros($"purchase_ts").as("purchase_ts_us"))
  }

  val qAsofJoinSql: String =
    """WITH l AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |r AS (
      |  SELECT user_id, ts, max(value) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
      |       r.purchase_value, epoch_us(r.ts) AS purchase_ts_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  /** The skew-resistant bucketed as-of (windows on (key, time-bucket)
    * + carry table) against the SAME DuckDB ASOF oracle as q_asof_join
    * — the two formulations must be value-identical end-to-end, not
    * just in the spec's synthetic frames.
    */
  def qAsofBucketed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"value").as("purchase_value"))
    AsOfJoin.backwardBucketed(clicks, purchases, Seq("user_id"), "ts", "ts",
        bucketWidthMicros = 6L * 3600 * 1000000, // 6h buckets over ~90d span
        matchedTsCol = Some("purchase_ts"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"purchase_value", unix_micros($"purchase_ts").as("purchase_ts_us"))
  }

  /** Forward as-of: each click matched with the user's EARLIEST
    * purchase at or after it (DuckDB mirrors with `l.ts <= r.ts`).
    */
  def qAsofForward(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"value").as("purchase_value"))
    AsOfJoin.forward(clicks, purchases, Seq("user_id"), "ts", "ts",
        matchedTsCol = Some("purchase_ts"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"purchase_value", unix_micros($"purchase_ts").as("purchase_ts_us"))
  }

  val qAsofForwardSql: String =
    """WITH l AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |r AS (
      |  SELECT user_id, ts, max(value) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
      |       r.purchase_value, epoch_us(r.ts) AS purchase_ts_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin

  // ---------------------------------------------------------- windows

  /** The analytic-window family the reference's W1 generalizes into:
    * lag/lead, running and sliding frame aggregates, rank/dense_rank/
    * percent_rank, ntile — one shuffle per distinct partitioning.
    */
  def qWindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seq = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val byPrice = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
    val cents = round($"o_totalprice" * 100).cast("long")
    Tables.load(spark, dir, "orders")
      .withColumn("cents", cents)
      .select(
        $"o_orderkey", $"o_custkey",
        row_number().over(seq).as("order_ix"),
        lag($"o_totalprice", 1).over(seq).as("prev_price"),
        lead($"o_totalprice", 1).over(seq).as("next_price"),
        sum($"cents").over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_cents"),
        sum($"cents").over(seq.rowsBetween(-2, Window.currentRow))
          .as("moving_cents3"),
        rank().over(byPrice).as("price_rank"),
        dense_rank().over(byPrice).as("price_dense_rank"),
        percent_rank().over(byPrice).as("price_pct_rank"),
        ntile(4).over(seq).as("quartile"))
  }

  // DuckDB sum(BIGINT) yields HUGEINT, which the driver's pandas path
  // coerces to float64 → hash mismatch vs Spark's int64. CAST back to
  // BIGINT in the oracle (same discipline as qBucketedJoinSql).
  val qWindowAnalyticsSql: String =
    """SELECT o_orderkey, o_custkey,
      |  row_number() OVER seq AS order_ix,
      |  lag(o_totalprice, 1) OVER seq AS prev_price,
      |  lead(o_totalprice, 1) OVER seq AS next_price,
      |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
      |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents3,
      |  rank() OVER price AS price_rank,
      |  dense_rank() OVER price AS price_dense_rank,
      |  percent_rank() OVER price AS price_pct_rank,
      |  ntile(4) OVER seq AS quartile
      |FROM (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |       price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)""".stripMargin

  // ------------------------------------------------------ percentiles

  /** Exact percentiles (linear interpolation) + median per group —
    * sort-based exact aggregation; the approx twin for 100 TB is
    * `approx_percentile`, covered rows-only in q_approx_stats.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"),
        round(expr("median(l_quantity)"), 4).as("med_qty"))
  }

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS med_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Percentile winsorization per group, value-checked: bounds rounded
    * at 4dp on BOTH sides before clipping (exact percentile ==
    * quantile_cont at that precision), so clip decisions are identical;
    * unclipped values pass through raw (bit-identical doubles).
    */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Winsorize.clip(
        Tables.load(spark, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
            $"l_extendedprice"),
        "l_extendedprice", Seq("l_returnflag"), lower = 0.02, upper = 0.98)
  }

  val qWinsorizeSql: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    round(quantile_cont(l_extendedprice, 0.02), 4) AS lo,
      |    round(quantile_cont(l_extendedprice, 0.98), 4) AS hi
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_extendedprice,
      |  CASE WHEN l.l_extendedprice < b.lo THEN b.lo
      |       WHEN l.l_extendedprice > b.hi THEN b.hi
      |       ELSE l.l_extendedprice END AS l_extendedprice_w,
      |  (l.l_extendedprice < b.lo OR l.l_extendedprice > b.hi)
      |    AS l_extendedprice_clipped
      |FROM lineitem l JOIN b USING (l_returnflag)""".stripMargin

  // ------------------------------------------------------------ pivot

  /** Pivot with EXPLICIT value list (no extra distinct scan — at scale
    * the value domain is declared, not discovered) over bigint cents.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(sum($"cents"))
  }

  // CAST each pivot sum: DuckDB HUGEINT → pandas float64 otherwise.
  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN cents END) AS BIGINT) AS "O",
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN cents END) AS BIGINT) AS "F",
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN cents END) AS BIGINT) AS "P"
      |FROM (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |GROUP BY o_orderpriority""".stripMargin

  /** Unpivot (melt) lineitem metrics to long format — the inverse
    * reshape, pure narrow map (no shuffle).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        "metric", "value")
  }

  val qUnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin

  // ----------------------------------------------------- embeddings

  /** Per-class embedding centroid in long format (label, dim, mean) —
    * the pooling step of a class-prototype / nearest-centroid pipeline.
    * posexplode → two-level hash aggregate; the shuffle carries only
    * (label, dim, partial-sum), never whole vectors.
    */
  def qEmbedPool(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings")
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"label", $"dim")
      .agg(round(avg($"v"), 6).as("dim_mean"))
  }

  val qEmbedPoolSql: String =
    """SELECT label, dim, round(avg(v), 6) AS dim_mean
      |FROM (SELECT label, unnest(embedding) AS v,
      |             generate_subscripts(embedding, 1) - 1 AS dim
      |      FROM embeddings)
      |GROUP BY label, dim""".stripMargin

  /** Deterministic negative sampling (contrastive-pair mining): 4 draws
    * per anchor over the dense doc_id space; the oracle re-derives the
    * Knuth draw hash in plain SQL (key shifted by draw×7919, reduced
    * mod 2^31 before the multiply — DuckDB raises on int64 overflow
    * where Java wraps) and re-joins the partner rows.
    */
  def qNegativePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val corpusSize = docs.count()
    graft.operators.Sampling.negativePairs(
        docs.select($"doc_id"),
        docs.select($"doc_id".as("neg_id"), $"source".as("neg_source")),
        "doc_id", "neg_id", corpusSize, k = 4, salt = 11L)
      .select($"doc_id", $"draw", $"neg_id", $"neg_source")
  }

  val qNegativePairsSql: String =
    """WITH draws AS (
      |  SELECT doc_id, unnest(range(1, 5)) AS draw FROM documents),
      |negs AS (
      |  SELECT doc_id, draw,
      |    (((doc_id + draw * 7919 + 11) % 2147483648) * 2654435761)
      |      % 4294967296 % (SELECT count(*) FROM documents) AS neg_id
      |  FROM draws)
      |SELECT g.doc_id, CAST(g.draw AS INTEGER) AS draw, g.neg_id,
      |       d2.source AS neg_source
      |FROM negs g JOIN documents d2 ON g.neg_id = d2.doc_id
      |WHERE g.neg_id <> g.doc_id""".stripMargin

  /** Int8 embedding quantization, value-checked bit-for-bit: the scale
    * is raw double passthrough (identical arithmetic both engines — no
    * rounding needed) and the codes serialize to CSV (the driver's
    * row-sorter can't hash array cells). The half-up rule is written as
    * `floor(x/scale + 0.5)` on BOTH sides because `round`'s
    * half-behavior differs across engines.
    */
  def qEmbedQuantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val codes = graft.sim.Quantize.quantize($"embedding", $"scale")
    Tables.load(spark, dir, "embeddings")
      .withColumn("scale", graft.sim.Quantize.quantScale($"embedding"))
      .select(
        $"vec_id", $"scale",
        array_join(transform(codes, c => c.cast("string")), ",").as("codes_csv"))
  }

  val qEmbedQuantizeSql: String =
    """SELECT vec_id, scale,
      |  array_to_string(list_transform(embedding,
      |    x -> CAST(CAST(CASE WHEN scale > 0
      |           THEN floor(CAST(x AS DOUBLE) / scale + 0.5)
      |           ELSE 0 END AS BIGINT) AS VARCHAR)), ',') AS codes_csv
      |FROM (
      |  SELECT vec_id, embedding,
      |    CAST(coalesce(list_max(list_transform(embedding, x -> abs(x))), 0)
      |         AS DOUBLE) / CAST(127 AS DOUBLE) AS scale
      |  FROM embeddings)""".stripMargin

  // -------------------------------------------------------- range join

  /** Binned range join (operators.RangeJoin): repeat-purchase pairs —
    * orders by the same customer strictly within 30 days after an
    * earlier order. One-day-granular timestamps over 30-day intervals
    * with 30-day bins → each interval explodes to ≤ 2 bins; the naive
    * theta formulation the oracle runs would be a per-customer cross
    * product in Spark.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val us30d = 30L * 86400000000L
    // o_orderdate is TIMESTAMP_NTZ in parquet; the session is pinned
    // UTC, so the cast to instant-typed timestamp is value-preserving
    val orders = Tables.load(spark, dir, "orders")
      .withColumn("od_us", unix_micros($"o_orderdate".cast("timestamp")))
    val points = orders.select($"o_orderkey".as("later_key"),
      $"o_custkey", $"od_us".as("x"))
    val intervals = orders.select($"o_orderkey".as("earlier_key"),
      $"o_custkey", $"od_us".as("s"), ($"od_us" + us30d).as("e"))
    graft.operators.RangeJoin.pointInInterval(points, intervals,
        Seq("o_custkey"), "x", "s", "e", binWidth = us30d)
      .filter($"x" > $"s") // strictly later — also excludes self-pairs
      .select($"o_custkey", $"earlier_key", $"later_key")
  }

  val qRangeJoinSql: String =
    """SELECT a.o_custkey, a.o_orderkey AS earlier_key, b.o_orderkey AS later_key
      |FROM orders a JOIN orders b
      |  ON a.o_custkey = b.o_custkey
      | AND epoch_us(b.o_orderdate) > epoch_us(a.o_orderdate)
      | AND epoch_us(b.o_orderdate) <= epoch_us(a.o_orderdate) + 2592000000000""".stripMargin

  // --------------------------------------------------------- sampling

  /** Reproducible train/test split via content-addressed hashing
    * (operators.Sampling): the verdict is a pure function of the key,
    * so the DuckDB oracle re-derives the exact membership in SQL —
    * engine-portable splits, the property `df.sample` cannot give.
    */
  def qSampleSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val Seq(train, test) =
      graft.operators.Sampling.splitByKey(orders, "o_orderkey", Seq(0.8, 0.2))
    train.withColumn("split", lit("train"))
      .unionByName(test.withColumn("split", lit("test")))
      .select($"o_orderkey", $"split")
  }

  val qSampleSplitSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN ((o_orderkey % 2147483648) * 2654435761) % 4294967296
      |            < CAST(floor(0.8 * 4294967296) AS BIGINT)
      |       THEN 'train' ELSE 'test' END AS split
      |FROM orders""".stripMargin

  /** Per-stratum deterministic sampling (the sampleBy counterpart):
    * each order status keeps its own hash-band fraction, strata absent
    * from the map drop entirely. Same engine-portable Knuth hash as
    * q_sample_split (key reduced mod 2³¹ before the multiply), so the
    * oracle replays the exact keep decision per row.
    */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Sampling.stratifiedSample(
        Tables.load(spark, dir, "orders"), "o_orderstatus", "o_orderkey",
        Map("O" -> 0.5, "F" -> 0.25))
      .select($"o_orderkey", $"o_orderstatus")
  }

  val qStratifiedSampleSql: String =
    """SELECT o_orderkey, o_orderstatus
      |FROM (SELECT *, ((o_orderkey % 2147483648) * 2654435761) % 4294967296 AS h
      |      FROM orders)
      |WHERE (o_orderstatus = 'O' AND h < 2147483648)
      |   OR (o_orderstatus = 'F' AND h < 1073741824)""".stripMargin

  /** EXACT-K deterministic sample ([[graft.operators.Sampling
    * .exactSample]], round 15): the k lowest-hashing keys — "exactly
    * 200 documents, the same 200 every run, any layout, any engine".
    * Plans as TakeOrderedAndProject (per-task k-bounded heaps, k rows
    * to the driver merge — never a global sort); the oracle re-derives
    * the identical set with the shared Knuth hash + ORDER BY LIMIT.
    */
  def qExactSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Sampling.exactSample(
        Tables.load(spark, dir, "orders"), "o_orderkey", k = 200)
      .select($"o_orderkey", $"o_totalprice")
  }

  val qExactSampleSql: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY ((o_orderkey % 2147483648) * 2654435761) % 4294967296 ASC,
      |         o_orderkey ASC
      |LIMIT 200""".stripMargin

  // ------------------------------------------------------------ top-k

  /** Distributed exact top-k: Spark plans orderBy+limit as
    * TakeOrderedAndProject — per-partition heaps, only k rows reach the
    * driver-side merge; no global sort materializes at any scale.
    */
  def qTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
      .limit(100)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
  }

  val qTopkSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 100""".stripMargin

  /** Grouped top-k via the native heap aggregate (operators.TopK /
    * graft_topk_by): top-3 orders per customer — map-side partial
    * top-k means the shuffle carries ≤ 3 rows per customer per task,
    * not every order. Value-checked against DuckDB's window form.
    */
  def qTopkGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TopK.perKey(
        Tables.load(spark, dir, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_totalprice"),
        Seq("o_custkey"), "o_totalprice", "o_orderkey", k = 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
  }

  val qTopkGroupSql: String =
    """SELECT o_custkey, CAST(rn AS INTEGER) AS rank, o_orderkey, o_totalprice
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY o_custkey
      |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |      FROM orders)
      |WHERE rn <= 3""".stripMargin

  // ------------------------------------------------- approx sketches

  /** The sketch aggregates a 100 TB engine actually runs — HLL distinct
    * counts and quantile sketches. Sketch INTERNALS differ across
    * engines by design, so the raw estimates can't hash-compare — but
    * their GUARANTEES can: the query emits the exact statistics (SQL-
    * derivable) plus one boolean per sketch asserting the estimate
    * landed inside its published error bound, which the oracle states
    * as literal TRUE. The bounds are generous multiples of the
    * configured error (20% for rsd=0.05 HLL, 5% for rsd=0.01;
    * approx_percentile's rank error ≤ n/accuracy, far inside the
    * ±0.01-quantile window at every SF), and both estimate and bound
    * are deterministic for a given dataset — a broken sketch flips a
    * boolean and fails the hash. AnalyticSpec keeps the tighter
    * empirical checks.
    */
  def qApproxStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one pass: sketches and exact companions in the same aggregate
    // (the array percentiles are projected to scalars — an array cell
    // is unhashable in the driver's pandas compare)
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("ap"),
        approx_count_distinct($"l_orderkey", 0.01).as("ao"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)")
          .as("apq"),
        countDistinct($"l_partkey").as("exact_parts"),
        countDistinct($"l_orderkey").as("exact_orders"),
        expr("percentile(l_extendedprice, array(0.49, 0.51, 0.989, 0.991))")
          .as("epq"))
      .select($"l_returnflag", $"exact_parts", $"exact_orders",
        (abs($"ap" - $"exact_parts") <= $"exact_parts" * lit(0.2)).as("parts_ok"),
        (abs($"ao" - $"exact_orders") <= $"exact_orders" * lit(0.05)).as("orders_ok"),
        (element_at($"apq", 1) >= element_at($"epq", 1) &&
          element_at($"apq", 1) <= element_at($"epq", 2)).as("p50_ok"),
        (element_at($"apq", 2) >= element_at($"epq", 3) &&
          element_at($"apq", 2) <= element_at($"epq", 4)).as("p99_ok"))
  }

  val qApproxStatsSql: String =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  true AS parts_ok, true AS orders_ok, true AS p50_ok, true AS p99_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Column census (Profile.profile, exact mode): one aggregate pass
    * over orders → one row per profiled column with row/null/distinct
    * counts and stringified extremes. A derived nullable column
    * (status 'O' → NULL) exercises the null arithmetic; the oracle is
    * the per-column UNION ALL census. The approx (no-Expand) mode is
    * ProfileSpec's subject — a value oracle can't pin HLL estimates.
    */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_orderpriority")
      .withColumn("status_nullable",
        when($"o_orderstatus" === "O", lit(null)).otherwise($"o_orderstatus"))
    graft.operators.Profile.profile(df,
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "status_nullable"))
  }

  val qProfileSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count($c) AS n_nonnull, count(*) - count($c) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM src""".stripMargin
    """WITH src AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
      |    CASE WHEN o_orderstatus = 'O' THEN NULL
      |         ELSE o_orderstatus END AS status_nullable
      |  FROM orders)
      |""".stripMargin +
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "status_nullable").map(one).mkString("\nUNION ALL\n")
  }

  /** Stored mergeable NDV sketches — the pre-aggregation pattern that
    * answers "distinct entities over ANY date range" without rescanning
    * events: per-day HLL sketches land in a parquet table once (one
    * corpus pass), every later rollup is a union of |days| sketch
    * binaries. Three rollup ranges (all days, day-of-month ≤ 10,
    * Mondays) each emit the exact distinct event count (recomputed from
    * events — the oracle can pin it) plus `est_ok` = the sketch
    * estimate within 5% of exact, pinned TRUE: a sketch that stops
    * merging correctly (union bug, binary corruption through the
    * parquet round-trip) blows the bound and goes red. Estimates
    * themselves stay out of the projection — no cross-engine HLL
    * exists to oracle them bit-for-bit.
    */
  def qSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sketchDir = graft.util.Scratch.once(spark, dir, "sketch.fixtures") {
      val base = java.nio.file.Files
        .createTempDirectory("graft-gate-sketch").toString
      Tables.load(spark, dir, "events")
        .groupBy(to_date($"ts").as("day"))
        .agg(hll_sketch_agg($"event_id").as("sk"))
        .write.mode("overwrite").parquet(s"$base/daily_sketches")
      base
    }
    val sketches = spark.read.parquet(s"$sketchDir/daily_sketches")
    val events = Tables.load(spark, dir, "events")
      .select(to_date($"ts").as("day"), $"event_id")
    def range(id: String, pred: Column): DataFrame = {
      val est = sketches.filter(pred)
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
        .head().getLong(0)
      events.filter(pred)
        .agg(count_distinct($"event_id").as("exact_events"))
        .select(lit(id).as("range_id"), $"exact_events",
          (abs(lit(est) - $"exact_events") <=
            $"exact_events" * lit(0.05)).as("est_ok"))
    }
    range("all", lit(true))
      .unionByName(range("early_month", dayofmonth($"day") <= 10))
      .unionByName(range("mondays", dayofweek($"day") === 2))
  }

  val qSketchRollupSql: String =
    """SELECT 'all' AS range_id,
      |  CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events,
      |  true AS est_ok
      |FROM events
      |UNION ALL
      |SELECT 'early_month', CAST(count(DISTINCT event_id) AS BIGINT), true
      |FROM events WHERE dayofmonth(CAST(ts AS DATE)) <= 10
      |UNION ALL
      |SELECT 'mondays', CAST(count(DISTINCT event_id) AS BIGINT), true
      |FROM events WHERE dayofweek(CAST(ts AS DATE)) = 1""".stripMargin

  def queries: Map[String, Q] = Map(
    "q_sketch_rollup" -> (qSketchRollup _),
    "q_profile" -> (qProfile _),
    "q_asof_forward" -> (qAsofForward _),
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_bucketed" -> (qAsofBucketed _),
    "q_window_analytics" -> (qWindowAnalytics _),
    "q_percentiles" -> (qPercentiles _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_embed_pool" -> (qEmbedPool _),
    "q_embed_quantize" -> (qEmbedQuantize _),
    "q_negative_pairs" -> (qNegativePairs _),
    "q_winsorize" -> (qWinsorize _),
    "q_sample_split" -> (qSampleSplit _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_exact_sample" -> (qExactSample _),
    "q_topk" -> (qTopk _),
    "q_approx_stats" -> (qApproxStats _),
    "q_range_join" -> (qRangeJoin _),
    "q_topk_group" -> (qTopkGroup _))

  def oracles: Map[String, String] = Map(
    "q_sketch_rollup" -> qSketchRollupSql,
    "q_profile" -> qProfileSql,
    "q_asof_forward" -> qAsofForwardSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_asof_bucketed" -> qAsofJoinSql,
    "q_window_analytics" -> qWindowAnalyticsSql,
    "q_percentiles" -> qPercentilesSql,
    "q_pivot" -> qPivotSql,
    "q_unpivot" -> qUnpivotSql,
    "q_embed_pool" -> qEmbedPoolSql,
    "q_embed_quantize" -> qEmbedQuantizeSql,
    "q_negative_pairs" -> qNegativePairsSql,
    "q_winsorize" -> qWinsorizeSql,
    "q_sample_split" -> qSampleSplitSql,
    "q_stratified_sample" -> qStratifiedSampleSql,
    "q_exact_sample" -> qExactSampleSql,
    "q_topk" -> qTopkSql,
    "q_range_join" -> qRangeJoinSql,
    "q_topk_group" -> qTopkGroupSql,
    "q_approx_stats" -> qApproxStatsSql)
}
