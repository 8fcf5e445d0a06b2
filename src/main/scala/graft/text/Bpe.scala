package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and encoding — the tokenizer
  * stage of a training-data pipeline (the reference has nothing like
  * it; TextFunctions.tokenCount approximates token counts with a
  * whitespace split, this learns the actual subword vocabulary).
  *
  * Distributed shape (the SentencePiece/fastBPE factoring): the corpus
  * is first collapsed to a WORD-COUNT table (one shuffle over the
  * corpus — the only corpus-sized job), and every BPE iteration then
  * runs over that table, whose size is the distinct vocabulary, not
  * the corpus. Each of the `numMerges` iterations is two bounded jobs:
  *
  *  1. adjacent-pair counts weighted by word count (explode + sum) and
  *     a `limit 1` argmax to the driver — ONE row collected, ties
  *     broken (freq desc, pair lexicographic) so training is
  *     deterministic on any layout;
  *  2. a typed map rewriting each word's symbol sequence with the new
  *     merge (greedy left-to-right, non-overlapping — standard BPE).
  *
  * The word table is localCheckpointed each iteration (releasing its
  * predecessor) so iteration i never recomputes iterations 1..i-1 —
  * without the pin, the lazy lineage makes training O(M²). Driver
  * state is the merge list itself: `numMerges` rows, nothing else.
  *
  * At 100 TB: the corpus job is one `explode`+`groupBy` (the same
  * shape as q_vocab_topk); billions of distinct words distribute fine
  * — no iteration ever collects more than one row.
  */
object Bpe {

  /** One learned merge: at `rank`, the adjacent symbol pair
    * (`left`, `right`) with weighted frequency `freq` became one
    * symbol.
    */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Corpus → word-count table (`word`, `n`): lowercased whitespace
    * tokens, the only corpus-sized pass of training.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Greedy left-to-right, non-overlapping application of one merge to
    * a symbol sequence ("aaa" under (a,a) → [aa, a], never [a, aa]).
    */
  private[text] def applyMerge(syms: IndexedSeq[String], left: String,
                               right: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toIndexedSeq
  }

  /** Learn up to `numMerges` merges over a word-count table (`word`
    * string, `n` numeric). Stops early when the best remaining pair's
    * weighted frequency drops under `minFreq`.
    */
  def train(wordCounts: DataFrame, numMerges: Int,
            minFreq: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var words: Dataset[(IndexedSeq[String], Long)] =
      wordCounts.select(col("word"), col("n").cast("long"))
        .as[(String, Long)]
        .map { case (w, n) => (w.map(_.toString).toIndexedSeq, n) }
        .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = graft.util.PhaseTimer.time("bpe.paircount") {
        words.flatMap { case (syms, n) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, n))
        }.toDF("left", "right", "n")
          .groupBy("left", "right").agg(sum("n").as("freq"))
          .orderBy(col("freq").desc, col("left").asc, col("right").asc)
          .limit(1)
          .as[(String, String, Long)]
          .collect()
      }
      top.headOption match {
        case Some((l, r, f)) if f >= minFreq =>
          merges += Merge(rank, l, r, f)
          val next = graft.util.PhaseTimer.time("bpe.apply") {
            words.map { case (syms, n) => (applyMerge(syms, l, r), n) }
              .localCheckpoint()
          }
          graft.util.Scratch.release(words)
          words = next
          rank += 1
        case _ => done = true
      }
    }
    graft.util.Scratch.release(words)
    merges.result()
  }

  /** Encode `textCol` with a learned merge list: per word (lowercased
    * whitespace token), characters are merged in rank order, greedy
    * left-to-right per rank — exactly the training-time application, so
    * encode(train-corpus) reproduces training's final symbol table.
    * Output schema: (`idCol`, `tokens` — array of subword strings in
    * document order, `n_bpe_tokens`); join back on `idCol` for other
    * input columns. A typed per-partition map (the merge loop is
    * sequence-dependent — not expressible as built-in array
    * functions); the merge list broadcasts by closure, bounded by
    * `numMerges`. Lowercasing is Locale.ROOT on both paths (wordCounts
    * uses Spark's locale-agnostic `lower`): a locale-sensitive
    * toLowerCase would let a tr_TR JVM emit symbols training never saw.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the typed map below carries the id as Long; a non-integral id
    // (string/UUID/decimal) would CAST-to-NULL silently and corrupt
    // the join-back key of every output row — reject it loudly instead
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"Bpe.encode requires an integral id column; '$idCol' is $idType — " +
        "map it to a long (e.g. xxhash64 or a join surrogate) first")
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
            .filter(_.nonEmpty)
            .flatMap { w =>
              var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
              ordered.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
              syms
            }.toSeq
          (id, toks, toks.length.toLong)
        }
      }
      .toDF(idCol, "tokens", "n_bpe_tokens")
  }
}
