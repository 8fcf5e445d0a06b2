package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting. Everything here is a pure `Column` → `Column`
  * compiler over Spark built-ins (no UDFs): at 100 TB each function is
  * a per-row expression inside whole-stage codegen over a single scan —
  * zero shuffles, zero serialization boundaries.
  *
  * The reference has no text operators (its domain is stock quotes);
  * these extend the same engine per the harness north star
  * (BASELINE.json), following the reference's "config compiles to
  * Column expressions" design (SURVEY.md §2.11).
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped — `split` on a run of
    * whitespace yields leading "" for leading spaces, so filter.
    */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count approximation: alphanumeric runs count one
    * per ~4 chars (the empirical BPE token/char ratio), punctuation one
    * each. A real tokenizer vocabulary doesn't ship in this
    * environment; this regex approximation is deterministic and
    * preserves the ordering/statistics shape a budgeting pipeline needs.
    */
  def bpeTokenCountApprox(c: Column): Column = {
    val wordPieces = aggregate(
      transform(tokens(c), t => ceil(length(t).cast("double") / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val punct = regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("long")
    wordPieces + punct
  }

  /** Characters of punctuation per character (0 for empty). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("double") / length(c))

  /** Fraction of tokens that are in `stopwords` (lower-cased compare). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column =
    stopwordRatioOf(tokens(c), stopwords)

  /** [[stopwordRatio]] over a pre-tokenized array. The `Of` variants
    * exist because higher-order functions evaluate INTERPRETED: an
    * inline `tokens(c)` argument re-runs its regex split at every
    * reference, so a projection composing several text scores pays the
    * split 10-20× per row. Tokenize ONCE into a column and feed the
    * attribute here — identical values, one split.
    */
  def stopwordRatioOf(toks: Column, stopwords: Seq[String]): Column = {
    val sw = stopwords.map(_.toLowerCase)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => lower(t).isInCollection(sw))).cast("double") / size(toks))
  }

  /** Mean token length (0 for empty). */
  def meanTokenLength(c: Column): Column = meanTokenLengthOf(tokens(c))

  /** [[meanTokenLength]] over a pre-tokenized array. */
  def meanTokenLengthOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Heuristic quality score in [0,1] — the standard pre-training
    * filters (length band, punctuation sanity, stopword presence,
    * word-length sanity) blended with fixed weights. Deterministic;
    * thresholds follow common C4/Gopher-style rules.
    */
  def qualityScore(c: Column, stopwords: Seq[String] = Stopwords.english): Column =
    qualityScoreOf(c, tokens(c), stopwords)

  /** [[qualityScore]] with the token array precomputed (the raw text
    * column still feeds the character-level regex signals).
    */
  def qualityScoreOf(c: Column, toks: Column,
                     stopwords: Seq[String] = Stopwords.english): Column = {
    val nTok = size(toks).cast("double")
    val lengthScore = when(nTok >= 5 && nTok <= 10000, lit(1.0))
      .when(nTok > 0, lit(0.5)).otherwise(lit(0.0))
    val punct = punctRatio(c)
    val punctScore = when(punct <= 0.2, lit(1.0))
      .when(punct <= 0.4, lit(0.5)).otherwise(lit(0.0))
    val sw = stopwordRatioOf(toks, stopwords)
    val swScore = when(sw >= 0.05 && sw <= 0.6, lit(1.0)).otherwise(lit(0.3))
    val mwl = meanTokenLengthOf(toks)
    val wordScore = when(mwl >= 2.0 && mwl <= 12.0, lit(1.0)).otherwise(lit(0.3))
    // alphabetic density: symbol soup scores near zero here even when
    // its token statistics look plausible
    val alpha = when(length(c) === 0, lit(0.0))
      .otherwise(regexp_count(c, lit("[A-Za-z0-9]")).cast("double") / length(c))
    val alphaScore = when(alpha >= 0.7, lit(1.0))
      .when(alpha >= 0.4, lit(0.5)).otherwise(lit(0.0))
    round(lengthScore * 0.25 + punctScore * 0.2 + swScore * 0.25 +
      wordScore * 0.1 + alphaScore * 0.2, 4)
  }

  /** N-gram language ID: score = fraction of tokens in each language's
    * stopword list; argmax wins, ties resolve to the earlier language in
    * [[Stopwords.languages]] (deterministic). Returns the language code,
    * or "und" when nothing scores.
    */
  def langId(c: Column): Column = langIdOf(tokens(c))

  /** [[langId]] over a pre-tokenized array — one split instead of one
    * per language.
    */
  def langIdOf(toks: Column): Column = {
    val n = Stopwords.languages.size
    val scored = Stopwords.languages.zipWithIndex.map { case ((code, words), i) =>
      struct(
        stopwordRatioOf(toks, words).as("score"),
        lit(n - i).as("prio"), // earlier list position wins ties
        lit(code).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Content fingerprint: 64-bit hash of the normalized document
    * (lower-cased, whitespace-collapsed) — exact-dup key that survives
    * trivial reformatting.
    */
  def fingerprint(c: Column): Column =
    xxhash64(trim(regexp_replace(lower(c), "\\s+", " ")))

  /** Winnowing-style shingle fingerprints: the `w` smallest hashes of
    * the k-token shingle set — a compact, order-insensitive sketch for
    * near-dup detection (Schleimer et al., SIGMOD'03 winnowing idea,
    * simplified to bottom-w).
    */
  def shingleSketch(c: Column, k: Int = 3, w: Int = 16): Column =
    slice(array_sort(transform(Shingles.shingles(tokens(c), k), s => xxhash64(s))), 1, w)

  // ---------------------------------------- PII scrubbing

  /** PII patterns — deliberately restricted to regex features Java and
    * RE2 (DuckDB) agree on (character classes, bounded repeats, \b), so
    * the DuckDB oracle can run the identical pattern. Conservative
    * pretraining-scrub shapes: emails, dotted-quad IPs, NANP-style
    * phone numbers.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Replace every email/IP/phone occurrence with a typed placeholder
    * token, in that fixed order (emails first, so an address-embedded
    * dotted quad is consumed as part of the email, not re-matched).
    * Pure chained `regexp_replace` — single pass per pattern inside
    * codegen, no shuffle.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Per-pattern match counts on the RAW text (audit columns for a
    * scrub report; overlapping patterns count independently here, while
    * [[redactPii]] resolves overlaps by its replacement order).
    */
  def piiCounts(c: Column): (Column, Column, Column) =
    (regexp_count(c, lit(emailPattern)),
      regexp_count(c, lit(ipv4Pattern)),
      regexp_count(c, lit(phonePattern)))

  // ---------------------------------------- repetition profile (Gopher-style)

  /** Fraction of tokens that are repeats of an earlier token:
    * `1 - distinct/total` (0 for empty docs). Degenerate spam — "buy
    * buy buy …" — scores near 1; the standard repetition filter signal.
    */
  def dupTokenFrac(c: Column): Column = dupTokenFracOf(tokens(c))

  /** [[dupTokenFrac]] over a pre-tokenized array. */
  def dupTokenFracOf(toks: Column): Column =
    when(size(toks) > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
      .otherwise(lit(0.0))

  /** Fraction of non-empty LINES that repeat an earlier line — the
    * boilerplate/navigation-chrome signal.
    */
  def dupLineFrac(c: Column): Column = {
    val lines = filter(split(c, "\n"), l => length(trim(l)) > 0)
    when(size(lines) > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
      .otherwise(lit(0.0))
  }

  /** Fraction of tokens taken by the single most frequent token — the
    * keyword-stuffing signal. Computed per ROW with a sorted-run scan
    * (sort the token array, longest equal-run via one `aggregate`
    * pass): zero shuffle, no exploded (doc, token) pairs — the shape
    * that survives a 100 TB corpus. One `aggregate` carrying a struct
    * state, per the HOF discipline (heavy subtrees only in argument
    * positions).
    */
  def topTokenFrac(c: Column): Column = topTokenFracOf(tokens(c))

  /** [[topTokenFrac]] over a pre-tokenized array. */
  def topTokenFracOf(toks: Column): Column = {
    val best = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(toks) > 0, best.cast("double") / size(toks)).otherwise(lit(0.0))
  }
}

/** Corpus-statistics operators that need a pass OVER the corpus (unlike
  * the per-row functions above): term frequency / inverse document
  * frequency weighting, the classic lexical-relevance signal.
  */
object TfIdf {

  /** One row per (doc, token): raw term frequency, document frequency,
    * and smoothed tf-idf (`tf × (ln((N+1)/(df+1)) + 1)` — the standard
    * smooth-idf form; no zero division, unseen-token idf bounded).
    *
    * Scale shape: explode → (doc, token) hash aggregate with map-side
    * combine; document frequencies derive from the ALREADY-distinct
    * (doc, token) pairs (no count_distinct shuffle); the df join is on
    * thin token keys and broadcasts when the vocabulary is small.
    * `corpusSize` is the document count — pass it in (one `count()`
    * upstream) so the operator stays a pure frame transform.
    */
  def tfidf(docs: org.apache.spark.sql.DataFrame, idCol: String,
            textCol: String, corpusSize: Long): org.apache.spark.sql.DataFrame = {
    require(corpusSize > 0, s"corpusSize must be positive: $corpusSize")
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    // tf feeds the df aggregate AND the final join: materialize the
    // thin pair table once instead of re-exploding the corpus per branch
    val tf = graft.util.Scratch.transientCheckpoint(
      toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
        .localCheckpoint())
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .withColumn("tfidf", round(col("tf") *
        (log(lit(corpusSize + 1.0) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Okapi BM25 term weights, one row per (doc, token) — the standard
    * retrieval-relevance score (Robertson et al., TREC-3) with Lucene's
    * non-negative idf floor `ln(1 + (N-df+0.5)/(df+0.5))`. Used by
    * curation pipelines to rank corpus documents against query terms
    * and by retrieval-based decontamination.
    *
    * Scale shape mirrors [[tfidf]]: one explode → (doc, token) hash agg
    * with map-side combine; doc lengths fold off the tf table (no
    * second corpus scan); `avgdl` is one scalar from an exact integer
    * sum (bit-identical across engines, unlike a double `avg`), carried
    * by a broadcast single-row cross join — no driver round-trip.
    */
  def bm25(docs: org.apache.spark.sql.DataFrame, idCol: String,
           textCol: String, corpusSize: Long,
           k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(corpusSize > 0, s"corpusSize must be positive: $corpusSize")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    // tf feeds THREE consumers (doc lengths, document frequencies, the
    // final join): materialize the thin pair table once instead of
    // re-scanning and re-exploding the corpus per branch
    val tf = graft.util.Scratch.transientCheckpoint(
      toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
        .localCheckpoint())
    val doclen = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    // exact integer total / count → the one division is IEEE-identical
    // in any engine; avg(double) would hash-mismatch on association
    val avgdl = doclen.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (lit(corpusSize.toDouble) - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    tf.join(dfreq, "token")
      .join(doclen, idCol)
      .crossJoin(broadcast(avgdl))
      .withColumn("bm25", round(idf *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("dl"), col("bm25"))
  }
}

/** Token-shingle helper shared by text + dedup operators. */
object Shingles {
  /** k-token shingles joined by a single space; empty array when fewer
    * than k tokens. Distinct (set semantics for Jaccard).
    *
    * PERFORMANCE-CRITICAL SHAPE: higher-order functions evaluate
    * interpreted (outside codegen) and re-evaluate any outer expression
    * captured in a lambda body once PER ELEMENT — a naive
    * `transform(sequence(...), i => slice(tokens, i+1, k))` re-runs the
    * whole tokenization (regex split) O(n) times per row, O(n²) splits
    * overall. This formulation only ever references `tokens` in
    * argument positions (evaluated once per row): k-1 `zip_with` passes
    * against shifted copies, null-padded tails filtered out.
    */
  def shingles(tokens: Column, k: Int): Column = {
    require(k >= 1, s"shingle size must be >= 1, got $k")
    if (graft.functions.GraftNative.enabled)
      call_function("graft_shingles", tokens, lit(k))
    else shinglesHof(tokens, k)
  }

  /** Portable HOF shingle form (the compiled twin is
    * graft.functions.TokenShingles; DedupSpec asserts bit-for-bit
    * agreement).
    */
  def shinglesHof(tokens: Column, k: Int): Column = {
    val joined = (1 until k).foldLeft(tokens) { (acc, j) =>
      // zip_with pads the shorter side with null; concat propagates the
      // null, marking positions with fewer than j+1 remaining tokens
      // length = size(tokens) over-covers and clamps; an Int.MaxValue
      // literal would overflow Slice's internal bound arithmetic
      zip_with(acc, slice(tokens, lit(j + 1), size(tokens)),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(filter(joined, s => s.isNotNull))
  }
}

/** Minimal stopword lists for the language-ID heuristic — top function
  * words only; enough signal to separate the five languages, small
  * enough to inline into codegen'd `isin` lists.
  */
object Stopwords {
  val english: Seq[String] = Seq("the", "of", "and", "to", "in", "a", "is",
    "that", "for", "it", "on", "with", "as", "was", "at", "by", "an", "be",
    "this", "are", "from", "or", "not", "but")
  val spanish: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un",
    "una", "los", "las", "por", "con", "para", "es", "del", "se", "no",
    "como", "más", "pero", "sus", "le", "ya", "o")
  val portuguese: Seq[String] = Seq("o", "a", "de", "que", "e", "do", "da",
    "em", "um", "para", "é", "com", "não", "uma", "os", "no", "se", "na",
    "por", "mais", "as", "dos", "como", "mas")
  val french: Seq[String] = Seq("le", "la", "de", "et", "les", "des", "en",
    "un", "du", "une", "que", "est", "pour", "qui", "dans", "a", "par",
    "plus", "pas", "au", "sur", "ne", "se", "ce")
  val german: Seq[String] = Seq("der", "die", "und", "in", "den", "von",
    "zu", "das", "mit", "sich", "des", "auf", "für", "ist", "im", "dem",
    "nicht", "ein", "eine", "als", "auch", "es", "an", "werden")

  /** Ordered — ties in langId resolve to the earlier entry. */
  val languages: Seq[(String, Seq[String])] = Seq(
    "en" -> english, "es" -> spanish, "pt" -> portuguese,
    "fr" -> french, "de" -> german)
}
