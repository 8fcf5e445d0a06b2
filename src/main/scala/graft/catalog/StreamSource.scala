package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Forwarding scan builder: batch reads keep Spark's stock parquet
  * pushdown surface (catalyst filter pushdown feeds [[GraftFileIndex]]
  * manifest pruning, column pruning feeds nested-schema pruning)
  * untouched, while `build()` wraps the resulting [[ParquetScan]] so
  * the scan ALSO answers `toMicroBatchStream` — the hook
  * `spark.readStream.table("graft.cat.sch.t")` resolves through.
  */
private[catalog] final class GraftScanBuilder(spark: SparkSession,
                                              wh: Warehouse,
                                              snap: TableSnapshot,
                                              tableSchema: StructType,
                                              dataFields: StructType,
                                              delegate: ParquetScanBuilder,
                                              options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate.pushFilters(filters)
  override def pushedFilters: Array[Predicate] = delegate.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)

  override def build(): Scan =
    new GraftScan(spark, wh, snap, tableSchema, dataFields,
      delegate.build(), options)
}

/** A [[ParquetScan]] that can also stream. Batch behavior delegates
  * verbatim; `toMicroBatchStream` tails the COMMIT LOG instead
  * ([[GraftMicroBatchStream]]).
  */
private[catalog] final class GraftScan(spark: SparkSession,
                                       wh: Warehouse,
                                       snap: TableSnapshot,
                                       tableSchema: StructType,
                                       dataFields: StructType,
                                       delegate: ParquetScan,
                                       options: CaseInsensitiveStringMap)
    extends Scan {

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def toBatch: Batch = delegate.toBatch

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(spark, wh, snap, tableSchema, dataFields,
      delegate.readSchema(), options)
}

/** Stream offset = the last commit version this stream has processed. */
private[catalog] final case class GraftStreamOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[catalog] object GraftStreamOffset {
  def parse(json: String): GraftStreamOffset =
    GraftStreamOffset(json.filter(c => c.isDigit || c == '-').toLong)
}

/** `spark.readStream` over a warehouse table: TABLE TAILING off the
  * commit log — the counterpart of Delta's streaming source, with the
  * same contract:
  *
  *  - micro-batch `(start, end]` scans the files that FIRST APPEARED
  *    in commit versions `start+1 .. end` (file-level diff of adjacent
  *    snapshots, O(touched files) per batch, never O(table));
  *  - the default starting offset is version 0, so a fresh stream
  *    first replays the table's surviving history commit-by-commit —
  *    for an append-only table exactly the current contents; pass
  *    `option("startingVersion", v)` to begin at commit `v` (use
  *    `currentVersion + 1` for changes-only tailing);
  *  - a commit that REWRITES files (merge update, deleteWhere,
  *    compaction rewrites) re-emits the surviving rows of the files it
  *    added — Delta's `ignoreChanges` semantics, the honest shape for
  *    a log whose commits carry file lists rather than persisted
  *    row-level change files (the batch [[Warehouse.changeFeed]] is
  *    the row-exact diff when one is needed);
  *  - a stream lagging past [[Warehouse.vacuum]] retention fails
  *    loudly at `snapshotAt`, like Delta's source after vacuum.
  *
  * Planning is METADATA-ONLY end-to-end: each batch's file list and
  * (bytes, mtime) come from the version files alone, the scan rides a
  * [[GraftFileIndex]] over a pseudo-snapshot of exactly the new files
  * (inheriting manifest min/max/bloom exclusion for pushed filters,
  * valid for any snapshot by the exclusion contract), and the reader
  * factory is schema-driven, shared across batches. Exactly-once comes
  * from Spark's offset log: version ranges are deterministic, replayed
  * ranges re-plan the same files.
  */
private[catalog] final class GraftMicroBatchStream(spark: SparkSession,
                                                   wh: Warehouse,
                                                   snap: TableSnapshot,
                                                   tableSchema: StructType,
                                                   dataFields: StructType,
                                                   requiredSchema: StructType,
                                                   options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val ref = snap.ref

  override def initialOffset(): Offset = {
    val startingVersion = Option(options.get("startingVersion")).map(_.toLong)
    GraftStreamOffset(startingVersion.map(_ - 1).getOrElse(0L))
  }

  override def latestOffset(): Offset =
    GraftStreamOffset(wh.currentVersion(ref).getOrElse(0L))

  // -- Trigger.AvailableNow: pin the target version at query start so
  // the run drains exactly the commits that existed then and stops,
  // whatever lands concurrently (SupportsAdmissionControl surface)
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(wh.currentVersion(ref).getOrElse(0L))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowTarget.map(GraftStreamOffset(_)).getOrElse(latestOffset())

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Files first appearing in versions `(startV, endV]`, with their
    * recorded sizes — one pseudo-snapshot the stock parquet machinery
    * scans. Files added then retired WITHIN the range are still
    * emitted (their rows were appended; a later delete is a later
    * fact), matching the per-commit replay a slower trigger would see.
    */
  private def addedSnapshot(startV: Long, endV: Long): TableSnapshot = {
    val files = Seq.newBuilder[String]
    val meta = Map.newBuilder[String, (Long, Long)]
    var prev: Set[String] =
      if (startV == 0) Set.empty else wh.snapshotAt(ref, startV).files.toSet
    ((startV + 1) to endV).foreach { v =>
      val s = wh.snapshotAt(ref, v)
      s.files.filterNot(prev).foreach { f =>
        files += f
        s.fileMeta.get(f).foreach(meta += f -> _)
      }
      prev = s.files.toSet
    }
    TableSnapshot(ref, endV, snap.schemaJson, files.result().distinct,
      meta.result())
  }

  private def scanFor(pseudo: TableSnapshot): ParquetScan = {
    val b = ParquetScanBuilder(spark,
      new GraftFileIndex(spark, wh, pseudo),
      tableSchema, dataFields, options)
    b.pruneColumns(requiredSchema)
    b.build()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].version
    val e = end.asInstanceOf[GraftStreamOffset].version
    if (e <= s) Array.empty
    else scanFor(addedSnapshot(s, e)).toBatch.planInputPartitions()
  }

  /** Schema-driven, not file-driven — the factory from a scan over the
    * CURRENT snapshot reads any batch's file partitions (same session,
    * same read/data/partition schemas).
    */
  override def createReaderFactory(): PartitionReaderFactory =
    scanFor(wh.snapshot(ref).getOrElse(snap)).toBatch.createReaderFactory()
}
