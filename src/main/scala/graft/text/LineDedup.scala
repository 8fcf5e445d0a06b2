package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication — the CCNet/RefinedWeb-style
  * boilerplate scrub: a line that occurs more than `maxOccurrences`
  * times ACROSS THE WHOLE CORPUS (nav bars, cookie banners, copyright
  * footers, repeated headers) is dropped from every document, and each
  * document is reassembled from its surviving lines in original order.
  * This is the granularity below document-level dedup
  * ([[graft.dedup.Dedup]]): two documents can be globally unique while
  * 80% of their lines are shared boilerplate.
  *
  * Scale shape (100 TB): the exploded (id, pos, line) frame never
  * re-shuffles whole documents — counting is a hash aggregate on `line`
  * with map-side partial combine, and the banned set (count >
  * maxOccurrences) is the SMALL side by construction (boilerplate is
  * rare among distinct lines), so the `left_anti` join broadcasts under
  * AQE or shuffles thin (line) keys at worst. Reassembly groups by doc
  * id — bounded per-group state (one document's lines), no global sort.
  * Occurrence counts use total multiplicity (a line repeated within one
  * document counts each time), so within-doc repetition is scrubbed by
  * the same pass.
  */
object LineDedup {

  /** Explode documents into (idCol, pos, line) — split on '\n' with
    * trailing empties kept, so reassembly is lossless for clean docs.
    */
  def explodeLines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))

  /** Corpus-wide occurrence count per exact line (with multiplicity). */
  def lineCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\n", -1)).as("line"))
      .groupBy("line").agg(count(lit(1)).as("n"))

  /** Rewrite `textCol` with over-represented lines removed. Adds
    * `outCol` (the scrubbed text; empty string when every line was
    * boilerplate) and `lines_kept` to the input frame; all original
    * columns pass through. `pos`/`line`/`lines_kept`/`outCol` must not
    * already exist on the input.
    */
  def stripDuplicatedLines(docs: DataFrame, idCol: String, textCol: String,
                           maxOccurrences: Long = 1,
                           outCol: String = "clean_text"): DataFrame = {
    val reserved = Seq("pos", "line", "lines_kept", outCol)
    val collisions = docs.columns.filter(reserved.contains)
    require(collisions.isEmpty,
      s"input columns collide with internal names: ${collisions.mkString(", ")}")
    val lines = explodeLines(docs, idCol, textCol)
    val banned = lines.groupBy("line").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxOccurrences).select("line")
    val kept = lines.join(banned, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol)).agg(
      concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as(outCol),
      count(lit(1)).as("lines_kept"))
    docs.join(rebuilt, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("")))
      .withColumn("lines_kept", coalesce(col("lines_kept"), lit(0L)))
  }
}
