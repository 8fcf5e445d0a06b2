package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1 — the reference's signature latest-record-per-key operator — in
  * two physical shapes:
  *
  *  - [[window]]: `row_number` over (key, order desc), the direct
  *    mapping of `QUALIFY ROW_NUMBER() = 1`. One shuffle + per-key sort.
  *    A single hot key serializes through one task.
  *  - [[salted]]: two-stage `max_by` aggregation. Stage 1 aggregates
  *    (key, salt) partial winners with map-side combine; stage 2
  *    reduces the ≤`salts` finalists per key. No per-key sort, and a
  *    hot key's rows split across `salts` reducers before ever meeting
  *    — the skew-resistant plan for 100 TB key distributions.
  *
  * Both are deterministic given a total order (the caller's orderBy
  * columns must be a total order per key — same contract as the gate's
  * window queries) and produce IDENTICAL results; the gate runs the
  * salted form against the window form's oracle.
  */
object LatestPerKey {

  def window(df: DataFrame, keys: Seq[String], orderDesc: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderDesc.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  def salted(df: DataFrame, keys: Seq[String], orderDesc: Seq[String],
             salts: Int = 32): DataFrame = {
    val cols = df.columns.toSeq
    // max_by over a struct whose leading fields are the order columns:
    // struct comparison is lexicographic, so the max struct is the
    // latest row; remaining fields carry the full row through
    val ordStruct = struct(
      (orderDesc.map(col) ++ cols.filterNot(orderDesc.contains).map(col)): _*)
    val salt = pmod(hash(ordStruct), lit(salts))
    val partial = df
      .groupBy((keys.map(col) :+ salt.as("__salt")): _*)
      .agg(max(ordStruct).as("__w"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(max(col("__w")).as("__w"))
      .select(cols.map(c => col(s"__w.$c").as(c)): _*)
  }
}
