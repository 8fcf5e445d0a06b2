package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.{TableRef, Warehouse}

/** Native MERGE, replacing the reference's Delta
  * `whenMatchedUpdateAll / whenNotMatchedInsertAll` (no Delta jar in this
  * environment — SURVEY.md §7.3).
  *
  * Semantics reproduced from /root/reference/lib/ingestors.py:122-126 (J1:
  * `old.id = new.id AND new.ts >= old.ts`) and
  * lib/checker_handler.py:179-191 (J2: pure 6-column equi):
  *
  *  - a target row with ≥1 source row satisfying the FULL condition is
  *    replaced by that source row's values (update-all);
  *  - a source row matching NO target row under the full condition is
  *    inserted — including the Delta quirk the reference inherits: a
  *    *stale* source row (key exists but `new.ts < old.ts`) fails the
  *    condition and is INSERTED as a duplicate key rather than discarded
  *    (SURVEY.md §2.5 J1 — covered by spec);
  *  - unmatched target rows are kept.
  *
  * Physical shape (designed for the 100 TB case): ONE equi hash join on
  * the key columns — the `ts` theta term stays in the join condition where
  * Catalyst extracts the equi part for hashing — then a per-target-row
  * window to resolve multiple matches. Catalyst broadcasts the source
  * side when it is small (typical CDC batch vs. big target); AQE handles
  * key skew. No driver-side collection anywhere.
  */
object Merge {

  private val TID = "__merge_tid"
  private val SRC = "__src_"
  private val PRESENT = "__src_present"

  /** Pure merge on DataFrames: returns the post-merge table contents.
    *
    * @param keys        equi-join key columns (present in both sides)
    * @param tsField     optional ordering field: adds Delta-J1's
    *                    `source.ts >= target.ts` to the match condition
    *                    and resolves multiple matching source rows by
    *                    latest ts (the reference pre-dedups sources per
    *                    key via W1, so multi-match is a degenerate case;
    *                    Delta would abort — we resolve deterministically
    *                    and document the deviation).
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            tsField: Option[String]): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val cols = target.columns.toSeq
    require(source.columns.toSeq == cols,
      s"merge schema mismatch: target ${cols.mkString(",")} vs source ${source.columns.mkString(",")}")

    val tgt = target.withColumn(TID, monotonically_increasing_id())
    val src = cols.foldLeft(source)((d, c) => d.withColumnRenamed(c, SRC + c))
      .withColumn(PRESENT, lit(true))

    val keyCond = keys.map(k => col(k) === col(SRC + k)).reduce(_ && _)
    val cond = tsField match {
      case Some(ts) => keyCond && col(SRC + ts) >= col(ts)
      case None => keyCond
    }

    val joined = tgt.join(src, cond, "full_outer")

    // Unmatched source rows → inserts (includes the stale-row quirk).
    val inserts = joined.filter(col(TID).isNull)
      .select(cols.map(c => col(SRC + c).as(c)): _*)

    // Target rows: pick the winning source row per target row (latest ts
    // first, nulls last), or keep the old values when no source matched.
    val targetRows = joined.filter(col(TID).isNotNull)
    val resolved = tsField match {
      case Some(ts) =>
        val w = Window.partitionBy(TID)
          .orderBy(col(SRC + ts).desc_nulls_last)
        targetRows.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
      case None =>
        // Pure equi condition (J2): any matching source row carries the
        // same key tuple; the scorecard upsert's source is an aggregate,
        // hence unique per key. Resolve arbitrarily-but-deterministically
        // by the first key's source value ordering.
        val w = Window.partitionBy(TID)
          .orderBy(col(SRC + keys.head).asc_nulls_last)
        targetRows.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
    }
    val updated = resolved.select(
      cols.map(c => when(col(PRESENT), col(SRC + c)).otherwise(col(c)).as(c)): _*)

    updated.unionByName(inserts)
  }
}

/** A warehouse-backed merge target: Delta-`DeltaTable.forName` stand-in
  * (S4). Bootstraps on first run like the scorecard upsert
  * (lib/checker_handler.py:173-177).
  */
final class MergeTable(spark: SparkSession, warehouse: Warehouse, ref: TableRef,
                       keys: Seq[String], tsField: Option[String]) {

  def upsert(source: DataFrame): Unit = {
    if (!warehouse.exists(ref)) {
      warehouse.overwrite(ref, source)
    } else {
      val merged = Merge.merge(warehouse.read(ref), source, keys, tsField)
      warehouse.overwrite(ref, merged)
    }
  }
}
