package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group, best-first with a dense `rank` column.
  * Ordering: highest `ordCol`, ties toward the lowest `tieCol`
  * (deterministic output when (keys, ord, tie) is unique).
  *
  * Two result-identical physical paths (TopKSpec asserts equality):
  *  - native: the graft_topk_by heap aggregate (ObjectHashAggregate,
  *    partial + final) — each map task reduces its slice of a group to
  *    ≤ k entries BEFORE the exchange, so the shuffle carries
  *    |groups| × k rows instead of every row. The 100 TB path.
  *  - fallback: the window formulation (`row_number <= k`), which
  *    shuffles and sorts the full input — correct everywhere, used
  *    when GraftExtensions is not registered.
  */
object TopK {

  def perKey(df: DataFrame, keys: Seq[String], ordCol: String, tieCol: String,
             k: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one grouping column")
    if (graft.functions.GraftNative.enabled) {
      val payload = struct(df.columns.map(col).toIndexedSeq: _*)
      df.groupBy(keys.map(col): _*)
        .agg(call_function("graft_topk_by",
          payload, col(ordCol), col(tieCol), lit(k)).as("__top"))
        .select(posexplode(col("__top")).as(Seq("__pos", "__row")))
        .select((col("__row.*") +: Seq((col("__pos") + 1).cast("int").as("rank"))): _*)
    } else {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col(ordCol).desc, col(tieCol).asc)
      df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }
  }
}
