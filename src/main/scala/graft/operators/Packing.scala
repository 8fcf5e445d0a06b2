package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** One packed document: its weight and the bin it landed in. */
final case class PackedDoc(
    id: Long,
    weight: Long,
    bin_id: Long,
    bin_weight: Long,   // total weight of the bin the doc landed in
    oversize: Boolean)  // weight > budget: singleton bin, caller splits

/** Sequence packing for training pipelines: group documents into bins
  * of a fixed token budget (the batch-construction step before
  * pretraining — pack short documents together so a 4k-token context
  * window isn't mostly padding). Not in the reference; a core
  * training-data operation.
  *
  * Distributed shape: packing is PER PARTITION — each task first-fit-
  * decreasing packs only its own rows, so there is no global sort, no
  * shuffle, and no driver-side loop; bin ids are globally unique by
  * construction ((partitionId << 32) | local index). The cost of
  * partition-local packing is bounded waste: each partition wastes at
  * most its tail bin, so the global overhead over a single-machine
  * pack is ≤ #partitions bins — negligible when partitions hold
  * thousands of documents. Memory per task is O(rows-in-partition)
  * (id, weight) pairs; the document text never enters the sort.
  */
object Packing {

  /** Pack rows into bins of at most `budget` total `weightCol`, first-
    * fit-decreasing within each partition (FFD ≤ 11/9·OPT + 1 bins).
    * Rows heavier than the budget get a SINGLETON bin flagged
    * `oversize` instead of being dropped — splitting/truncating is the
    * caller's policy decision.
    */
  def packByWeight(df: DataFrame, idCol: String, weightCol: String,
                   budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(weightCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val rows = it.toArray.sortBy { case (_, w) => -w }
        val pid = TaskContext.getPartitionId().toLong
        val binWeights = scala.collection.mutable.ArrayBuffer.empty[Long]
        val assignment = new Array[Int](rows.length)
        var i = 0
        while (i < rows.length) {
          val w = rows(i)._2
          // first fit: earliest bin with room (oversize rows never fit
          // an empty bin either, so they open their own)
          var b = 0
          while (b < binWeights.length && binWeights(b) + w > budget) b += 1
          if (b == binWeights.length) binWeights += 0L
          binWeights(b) += w
          assignment(i) = b
          i += 1
        }
        rows.iterator.zipWithIndex.map { case ((id, w), ix) =>
          val b = assignment(ix)
          PackedDoc(id, w, (pid << 32) | b.toLong, binWeights(b), w > budget)
        }
      }
      .toDF()
  }
}
