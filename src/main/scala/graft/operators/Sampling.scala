package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines. Spark's
  * `df.sample` is seed-stable only for a fixed partitioning — a
  * repartition or a different file split reshuffles which rows are
  * picked. Pipelines that must re-derive the SAME split across runs,
  * engines, and cluster sizes (train/holdout separation, A/B cohorts)
  * need content-addressed sampling: a per-row decision that is a pure
  * function of a key, never of physical layout.
  *
  * `keyHash` is Knuth multiplicative hashing over the 32-bit ring
  * (TAOCP vol. 3 §6.4): h = (key * 2654435761) mod 2^32, uniform
  * enough for fraction selection and exactly reproducible in any
  * engine with 64-bit integer arithmetic (the DuckDB oracle re-derives
  * it in plain SQL). Zero shuffles — pure per-row expressions inside
  * whole-stage codegen; at 100 TB a split is a filter, not a job.
  */
object Sampling {

  /** 2^32-ring Knuth multiplicative hash of an integral key (+ salt):
    * `((key + salt) mod 2^31) * 2654435761 mod 2^32`, in [0, 2^32).
    * The key is reduced mod 2^31 BEFORE multiplying so the product
    * stays under 2^63 — engines with checked int64 arithmetic (DuckDB
    * raises on overflow) evaluate it identically to Java's wrapping.
    */
  def keyHash(key: Column, salt: Long = 0L): Column =
    pmod(pmod(key.cast("long") + lit(salt), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))

  /** Deterministic Bernoulli-by-key sample: keeps rows whose key hashes
    * under `fraction` of the ring. Same key + salt → same verdict on
    * any engine, any layout, any day.
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          salt: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    df.filter(keyHash(col(keyCol), salt) < lit((fraction * 4294967296L).toLong))
  }

  /** EXACT-K deterministic sample: the `k` rows whose keys hash LOWEST
    * on the ring (ties broken by the key itself — a total order, so
    * the result is a set, not a layout accident). Fraction sampling
    * can only approximate a target size; dataset recipes that need
    * "exactly one million documents, the same million every run" need
    * the order statistic. Plans as TakeOrderedAndProject — each task
    * keeps a k-bounded heap and the driver merges |tasks| heaps, never
    * a global sort, never a full shuffle: at 100 TB the cost is one
    * scan plus k rows of movement. Same hash as every other sampler,
    * so the DuckDB oracle re-derives the exact set with ORDER BY ...
    * LIMIT k.
    */
  def exactSample(df: DataFrame, keyCol: String, k: Int,
                  salt: Long = 0L): DataFrame = {
    require(k >= 0, s"k must be non-negative: $k")
    df.orderBy(keyHash(col(keyCol), salt).asc, col(keyCol).asc).limit(k)
  }

  /** Disjoint deterministic splits (e.g. train/val/test): returns one
    * DataFrame per fraction, partitioning the keyspace by consecutive
    * hash bands. Fractions must sum to at most 1; rows hashing past the
    * last band are dropped (sum to exactly 1 to keep everything).
    */
  def splitByKey(df: DataFrame, keyCol: String, fractions: Seq[Double],
                 salt: Long = 0L): Seq[DataFrame] = {
    require(fractions.forall(_ >= 0) && fractions.sum <= 1.0 + 1e-9,
      s"fractions must be non-negative and sum <= 1: $fractions")
    val bounds = fractions.scanLeft(0.0)(_ + _)
    val h = keyHash(col(keyCol), salt)
    bounds.zip(bounds.tail).map { case (lo, hi) =>
      df.filter(h >= lit((lo * 4294967296L).toLong) &&
        h < lit((hi * 4294967296L).toLong))
    }
  }

  /** Leakage-safe split: near-duplicate GROUPS never straddle bands.
    * Each row adopts its group's canonical id as the split key (rows
    * absent from `groups` have no duplicates and keep their own id),
    * then [[splitByKey]]'s hash-band rule applies — a document and all
    * its near-dups land in the SAME band, so paraphrase leakage between
    * train and holdout is structurally impossible. `groups` is the
    * `(id, canonical_id)` frame of `Dedup.dupGroups`; it is
    * proportional to the duplicated subset, not the corpus, so the join
    * typically broadcasts, and the band decision stays a pure per-row
    * expression.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, groups: DataFrame,
                       fractions: Seq[Double], salt: Long = 0L): Seq[DataFrame] = {
    val keyed = df
      .join(groups.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("__split_key", coalesce(col("canonical_id"), col(idCol)))
      .drop("canonical_id")
    splitByKey(keyed, "__split_key", fractions, salt).map(_.drop("__split_key"))
  }

  /** Deterministic negative sampling — the contrastive-pair mining step
    * of embedding/retrieval training: for each anchor row, `k`
    * pseudo-random partners drawn by hashing (anchor key, draw index)
    * onto a dense id space `[0, corpusSize)` and equi-joining the
    * partner ids back to the corpus. Same reproducibility contract as
    * the other samplers: partners are a pure function of keys and salt,
    * independent of physical layout, re-derivable in any engine.
    *
    * Scale shape: the anchor side fans out exactly k rows each (bounded
    * explode), the join is a plain equi-join on the partner key — AQE
    * broadcasts the corpus side when it is small, otherwise both sides
    * hash-partition once; no cross product at any size.
    *
    * Self-matches (draw lands on the anchor itself) are filtered, so an
    * anchor can yield fewer than k partners; distinct draws may also
    * collide with each other (independent draws — dedupe downstream if
    * pairs must be unique). `corpusKey` must be dense `[0, corpusSize)`
    * for uniform coverage. Anchor and corpus column names must be
    * disjoint (rename the corpus side — it is usually a self-join).
    */
  def negativePairs(anchors: DataFrame, corpus: DataFrame,
                    anchorKey: String, corpusKey: String,
                    corpusSize: Long, k: Int, salt: Long = 0L): DataFrame = {
    require(corpusSize > 0, s"corpusSize must be positive: $corpusSize")
    require(k >= 1, s"k must be >= 1: $k")
    val shared = anchors.columns.toSeq.intersect(corpus.columns.toSeq) ++
      Seq("draw", "__neg").filter(anchors.columns.contains)
    require(shared.isEmpty,
      s"anchor/corpus column names must be disjoint: ${shared.mkString(", ")}")
    // spread draws across the ring: each draw index shifts the key by a
    // prime before the Knuth multiply (mirrored verbatim in the oracle)
    val neg = pmod(
      keyHash(col(anchorKey) + col("draw") * lit(7919L), salt), lit(corpusSize))
    anchors
      .select(anchors.columns.map(col).toIndexedSeq :+
        explode(sequence(lit(1), lit(k))).as("draw"): _*)
      .withColumn("__neg", neg)
      .filter(col("__neg") =!= col(anchorKey))
      .join(corpus, col("__neg") === corpus(corpusKey))
      .drop("__neg")
  }

  /** Temperature-based class balancing (the mC4/Pile resampling rule):
    * class s is kept with expected mass proportional to `count(s)^alpha`
    * — `alpha = 1` preserves the natural distribution, `alpha → 0`
    * flattens it, so rare languages/sources are upweighted relative to
    * dominant ones. `targetRows` sets the expected output size; each
    * class's keep fraction is `min(1, target·q_s / n_s)` with
    * `q_s = n_s^α / Σ n_t^α`, applied as the usual deterministic
    * hash-band filter (layout/engine-independent).
    *
    * Scale shape: one tiny per-class count aggregate (|classes| rows), a
    * single driver scalar for the normalizer, a broadcast join of the
    * per-class fractions, then a pure per-row filter — no wide shuffle.
    * Fractions are rounded to 6 decimals BEFORE thresholding so engines
    * whose `pow` differs in the last ulp still make identical per-row
    * decisions (the DuckDB oracle re-derives them with the same
    * rounding).
    */
  def temperatureSample(df: DataFrame, classCol: String, keyCol: String,
                        alpha: Double, targetRows: Long,
                        salt: Long = 0L): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    // one double: Σ n^α over the (bounded-small) class set
    val normalizer = counts.agg(sum(pow(col("__n"), lit(alpha)))).head.getDouble(0)
    val fracs = counts.select(
      col(classCol),
      round(
        least(lit(1.0),
          lit(targetRows) * pow(col("__n"), lit(alpha)) / lit(normalizer) / col("__n")),
        6).as("__f"))
    df.join(broadcast(fracs), Seq(classCol))
      .filter(keyHash(col(keyCol), salt) <
        (col("__f") * lit(4294967296L)).cast("long"))
      .drop("__f")
  }

  /** Fractional-epoch upsampling — the data-recipe stage that repeats
    * high-quality documents (e.g. "2.5 epochs of curated text, 1 epoch
    * of the rest"): every row yields `floor(epochs)` copies, plus one
    * extra copy for rows whose key hashes under the fractional part —
    * so a 2.5-epoch slice repeats every document twice and a
    * deterministic, layout-independent half of it a third time. Rows
    * with `epochs < 1` degrade to plain [[deterministicSample]]
    * (probability = the fraction). Output gains `epoch`, the 0-based
    * copy index (bigint), so downstream shuffling/packing can
    * interleave copies rather than emit them adjacent.
    *
    * `epochs` is rounded to 6 decimals before the floor/fraction split
    * so engines whose arithmetic differs in the last ulp make identical
    * per-row decisions (same discipline as [[temperatureSample]]).
    *
    * Scale shape: a pure per-row expression plus a bounded explode
    * (fan-out ≤ ceil(max epochs)) — no shuffle, stays inside
    * whole-stage codegen.
    */
  def epochUpsample(df: DataFrame, keyCol: String, epochs: Column,
                    salt: Long = 0L): DataFrame = {
    val e = round(epochs, 6)
    val full = floor(e).cast("long")
    // truncation (not rounding) on both engines: Spark's cast-to-long
    // truncates; the oracle must mirror with CAST(floor(...)).
    // NULL keys can't hash: they keep their guaranteed floor(e) copies
    // and never win the fractional extra (a NULL comparison would
    // otherwise NULL __copies and silently DROP the row entirely)
    val extra = when(col(keyCol).isNull, lit(0L))
      .otherwise((keyHash(col(keyCol), salt) <
        ((e - full) * lit(4294967296L)).cast("long")).cast("long"))
    df.withColumn("__copies", full + extra)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Stratified deterministic sample: per-stratum fractions, same
    * hash-band rule inside each stratum. Strata absent from `fractions`
    * are dropped (mirrors Spark's `sampleBy`).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double], salt: Long = 0L): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1]: $fractions")
    val h = keyHash(col(keyCol), salt)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === lit(stratum) && h < lit((f * 4294967296L).toLong))
    }
    df.filter(keep)
  }
}
