package graft.text

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {

  private def chunksOf(text: String, window: Int, stride: Int) = {
    import spark.implicits._
    Chunker.chunk(Seq((1L, text)).toDF("id", "text"), "id", "text", window, stride)
      .orderBy("chunk_id")
      .select($"chunk_id", $"start_tok", $"chunk_text", $"n_chunk_tokens")
      .as[(Int, Long, String, Int)].collect().toSeq
  }

  test("overlapping windows cover every token, offsets follow the stride") {
    val got = chunksOf("a b c d e f g", window = 4, stride = 2)
    assert(got === Seq(
      (0, 0L, "a b c d", 4),
      (1, 2L, "c d e f", 4),
      (2, 4L, "e f g", 3))) // short tail emitted, not padded or dropped
  }

  test("doc at or under one window is a single chunk") {
    assert(chunksOf("a b c", 4, 2) === Seq((0, 0L, "a b c", 3)))
    assert(chunksOf("a b c d", 4, 2) === Seq((0, 0L, "a b c d", 4)))
    assert(chunksOf("", 4, 2) === Seq((0, 0L, "", 0)))
  }

  test("stride == window means disjoint chunks, no overlap") {
    val got = chunksOf("a b c d e f", 2, 2)
    assert(got.map(_._3) === Seq("a b", "c d", "e f"))
    assert(got.map(_._2) === Seq(0L, 2L, 4L))
  }

  test("exact multiple leaves no empty trailing chunk") {
    // n=6, window=4, stride=2 → ceil((6-4)/2)+1 = 2 chunks, second ends flush
    val got = chunksOf("a b c d e f", 4, 2)
    assert(got === Seq((0, 0L, "a b c d", 4), (1, 2L, "c d e f", 4)))
  }

  test("invalid parameters and reserved columns fail loudly") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException](Chunker.chunk(df, "id", "text", 0, 1))
    intercept[IllegalArgumentException](Chunker.chunk(df, "id", "text", 4, 5))
    val bad = df.withColumn("chunk_id", org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalArgumentException](
      Chunker.chunk(bad, "id", "text", 4, 2))
    assert(e.getMessage.contains("chunk_id"))
  }
}
