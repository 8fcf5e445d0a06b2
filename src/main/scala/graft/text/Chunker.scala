package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window document chunking — the context-window preparation step
  * of RAG / pretraining pipelines: split each document into fixed-size
  * token windows with a configurable stride (overlap = window - stride),
  * one output row per chunk with its token offset, so downstream
  * embedding or packing stages work on bounded sequences.
  *
  * Scale shape: tokenization happens ONCE per row into an attribute;
  * chunk indices come from `posexplode(sequence(...))` and each chunk is
  * a `slice` on that attribute — per-row expressions, no shuffle, and
  * the fan-out is `ceil(tokens/stride)` rows per doc (bounded, known in
  * advance), never a cross product.
  */
object Chunker {

  /** One row per (doc, chunk): `idCol`, `chunk_id` (0-based), `start_tok`
    * (0-based token offset), `chunk_text` (space-joined window),
    * `n_chunk_tokens`. Documents with at most `window` tokens (including
    * empty ones) yield exactly one chunk. The last chunk may be shorter
    * than `window`; a final window fully covered by the previous one is
    * never emitted.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val reserved = Seq("__toks", "__n", "__nchunks", "chunk_id", "start_tok",
      "chunk_text", "n_chunk_tokens")
    val collisions = docs.columns.filter(reserved.contains)
    require(collisions.isEmpty,
      s"input columns collide with internal names: ${collisions.mkString(", ")}")
    val chunked = docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")))
      // chunks fully inside the previous window are redundant: emit
      // ceil((n - window) / stride) + 1 windows, minimum 1
      .withColumn("__nchunks",
        when(col("__n") <= window, lit(1L))
          .otherwise(ceil((col("__n") - window).cast("double") / stride) + 1))
      .select(col(idCol),
        posexplode(sequence(lit(0L), col("__nchunks") - 1)).as(Seq("chunk_id", "__i")),
        col("__toks"))
    val slicePart =
      slice(col("__toks"), (col("__i") * stride + 1).cast("int"), lit(window))
    chunked.select(
      col(idCol),
      col("chunk_id"),
      (col("__i") * stride).as("start_tok"),
      array_join(slicePart, " ").as("chunk_text"),
      size(slicePart).as("n_chunk_tokens"))
  }
}
