package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training
  * documents that share verbatim n-grams with an evaluation/benchmark
  * set (the standard leakage check run before pretraining — e.g. the
  * 13-gram overlap filters described in public LM training reports).
  * Not in the reference (which has no text pipeline); built on the same
  * shingle machinery as MinHash dedup (graft.text.Shingles).
  *
  * Scale shape (100 TB training corpus vs kilobyte-scale eval suites):
  * the corpus explodes to thin (doc_id, gram) pairs — never the full
  * text — and the benchmark side reduces to its DISTINCT gram set,
  * which is small by construction and BROADCASTS, so the corpus is
  * never shuffled; the only aggregation is the per-doc hit count,
  * map-side combinable.
  */
object Decontaminate {

  /** Distinct lowercase n-grams of a text column. */
  def grams(text: Column, n: Int): Column =
    Shingles.shingles(TextFunctions.tokens(lower(text)), n)

  /** Per-document contamination hits: (docId, hits) where `hits` is the
    * number of DISTINCT n-grams the document shares with ANY benchmark
    * document. Documents with zero hits are absent — the clean set is
    * an anti-join against this frame.
    */
  def contaminationHits(docs: DataFrame, docId: String, docText: String,
                        bench: DataFrame, benchText: String,
                        n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val docGrams = docs.select(col(docId).as("doc_id"),
      explode(grams(col(docText), n)).as("gram"))
    val benchGrams = bench
      .select(explode(grams(col(benchText), n)).as("gram"))
      .distinct()
    // both sides are distinct-per-key, so each (doc, gram) joins at
    // most once: a plain count IS the distinct-gram hit count
    docGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("hits"))
  }

  /** The training corpus with contaminated documents removed. */
  def decontaminated(docs: DataFrame, docId: String, docText: String,
                     bench: DataFrame, benchText: String,
                     n: Int): DataFrame =
    docs.join(
      contaminationHits(docs, docId, docText, bench, benchText, n)
        .withColumnRenamed("doc_id", "__contaminated_id"),
      col(docId) === col("__contaminated_id"), "left_anti")
}
