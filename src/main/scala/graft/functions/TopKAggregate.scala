package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, ByteArrayInputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Heap-based top-k-per-group aggregate: keeps the `k` rows with the
  * HIGHEST `ord` (ties broken toward the LOWEST `tie`) per group and
  * returns them best-first as `array<payload>`.
  *
  * Why a custom aggregate instead of the window formulation
  * (`row_number().over(partitionBy(g).orderBy(ord.desc)) <= k`): the
  * window shuffles and sorts EVERY row of every group; this aggregate
  * participates in partial (map-side) aggregation — each task reduces
  * its slice of a group to at most k entries before the exchange, so
  * the shuffle carries |groups| × k rows instead of the corpus. At
  * 100 TB that is the difference between a full-data sort-shuffle and
  * a kilobyte-per-group exchange. Catalyst plans it via
  * ObjectHashAggregate with partial + final steps out of the box.
  *
  * Rows with a null `ord` or `tie` are skipped (a null ordering key
  * has no rank). `ord` is compared as double, `tie` as long.
  */
case class TopKBy(
    payload: Expression,
    ord: Expression,
    tie: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "graft_topk_by"

  override def children: Seq[Expression] = Seq(payload, ord, tie)

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, tie.dataType) match {
      case (_: NumericType, LongType | IntegerType | ShortType | ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (payload, numeric ord, integral tie), got $other")
    }

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  @transient private lazy val ordAsDouble: Expression =
    if (ord.dataType == DoubleType) ord
    else org.apache.spark.sql.catalyst.expressions.Cast(ord, DoubleType)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordAsDouble.eval(input)
    val t = tie.eval(input)
    if (o != null && t != null) {
      val tieL = t match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
        case other => other.toString.toLong
      }
      val v = InternalRow.copyValue(payload.eval(input))
      buffer.offer(o.asInstanceOf[Double], tieL, v)
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.entries.forEach { e => buffer.offer(e.ord, e.tie, e.value) }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map(_.value))

  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payload.dataType))
  @transient private lazy val scratch = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.entries.size())
    buffer.entries.forEach { e =>
      out.writeDouble(e.ord)
      out.writeLong(e.tie)
      scratch.update(0, e.value)
      val row = payloadProj(scratch)
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buffer = new TopKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val o = in.readDouble()
      val t = in.readLong()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buffer.offer(o, t, InternalRow.copyValue(row.get(0, payload.dataType)))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(payload = newChildren(0), ord = newChildren(1), tie = newChildren(2))
}

/** One kept row: ordering key, tiebreak, payload value. */
final case class TopKEntry(ord: Double, tie: Long, value: Any)

/** Bounded min-heap whose head is the WORST kept entry (lowest ord,
  * then highest tie) — O(log k) insert, O(1) eviction decision.
  */
final class TopKBuffer(k: Int) {
  import TopKBuffer.Entry

  // Double.compare THROUGHOUT (insert, evict, emit): NaN orders as the
  // greatest value, matching Spark's sort order — primitive >/== would
  // never let a NaN displace a worse entry and would skip tie-breaks
  // between two NaNs, diverging from the window fallback's orderBy.
  val entries = new java.util.PriorityQueue[Entry](k + 1,
    (a: Entry, b: Entry) => {
      val c = java.lang.Double.compare(a.ord, b.ord)
      if (c != 0) c else java.lang.Long.compare(b.tie, a.tie)
    })

  def offer(ord: Double, tie: Long, value: Any): Unit = {
    if (entries.size() < k) { entries.offer(Entry(ord, tie, value)); () }
    else {
      val worst = entries.peek()
      val c = java.lang.Double.compare(ord, worst.ord)
      val better = c > 0 || (c == 0 && tie < worst.tie)
      if (better) {
        entries.poll()
        entries.offer(Entry(ord, tie, value))
        ()
      }
    }
  }

  /** Best-first: highest ord (NaN greatest), then lowest tie. */
  def sortedBestFirst: Array[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.iterator().asScala.toArray
      .sortWith { (a, b) =>
        val c = java.lang.Double.compare(a.ord, b.ord)
        c > 0 || (c == 0 && a.tie < b.tie)
      }
  }
}

object TopKBuffer {
  type Entry = TopKEntry
  private[functions] def Entry(ord: Double, tie: Long, value: Any): TopKEntry =
    TopKEntry(ord, tie, value)
}

/** Generalized top-k aggregate over an ARBITRARY sort order: keeps the
  * k payloads that sort FIRST under `sortKey` (a struct of the sort
  * expressions) with per-field direction and null placement — the
  * aggregate twin of `ORDER BY ... LIMIT k` per group, used by the
  * row_number-rewrite rule (graft.plans.RowNumberTopKRewrite) to
  * replace full window sort-shuffles with map-side partial top-k.
  * Rows whose retention is decided by an exact sort-key tie keep an
  * arbitrary winner — the same nondeterminism row_number() has there.
  */
case class SortTopK(
    payload: Expression,
    sortKey: Expression,
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SortTopKBuffer] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "graft_sort_topk"

  override def children: Seq[Expression] = Seq(payload, sortKey)

  private lazy val keySchema = sortKey.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = sortKey.dataType match {
    case s: StructType
        if s.length == ascending.size && s.length == nullsFirst.size && s.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a non-empty sort-key struct matching the direction flags, got $other")
  }

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  override def nullable: Boolean = false

  private def comparator: SortKeyComparator =
    new SortKeyComparator(keySchema, ascending.toArray, nullsFirst.toArray)

  override def createAggregationBuffer(): SortTopKBuffer =
    new SortTopKBuffer(k, comparator)

  override def update(buffer: SortTopKBuffer, input: InternalRow): SortTopKBuffer = {
    val key = sortKey.eval(input)
    if (key != null) {
      buffer.offer(
        InternalRow.copyValue(key).asInstanceOf[InternalRow],
        InternalRow.copyValue(payload.eval(input)))
    }
    buffer
  }

  override def merge(buffer: SortTopKBuffer, other: SortTopKBuffer): SortTopKBuffer = {
    other.entries.forEach { e => buffer.offer(e.key, e.value) }
    buffer
  }

  override def eval(buffer: SortTopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map(_.value))

  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(sortKey.dataType, payload.dataType))
  @transient private lazy val pairScratch =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  override def serialize(buffer: SortTopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.entries.size())
    buffer.entries.forEach { e =>
      pairScratch.update(0, e.key)
      pairScratch.update(1, e.value)
      val row = pairProj(pairScratch)
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SortTopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buffer = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      buffer.offer(
        InternalRow.copyValue(row.get(0, sortKey.dataType)).asInstanceOf[InternalRow],
        InternalRow.copyValue(row.get(1, payload.dataType)))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SortTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SortTopK =
    copy(payload = newChildren(0), sortKey = newChildren(1))
}

/** Lexicographic comparison of sort-key structs under per-field
  * direction and null placement; negative = a sorts earlier (better).
  */
final class SortKeyComparator(schema: StructType, ascending: Array[Boolean],
                              nullsFirst: Array[Boolean]) extends Serializable {
  private val fieldTypes = schema.fields.map(_.dataType)
  @transient private lazy val orderings: Array[Ordering[Any]] =
    fieldTypes.map(t =>
      org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(t)
        .asInstanceOf[Ordering[Any]])

  def compare(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < fieldTypes.length) {
      val aNull = a.isNullAt(i)
      val bNull = b.isNullAt(i)
      if (aNull || bNull) {
        if (!aNull || !bNull) // exactly one null decides
          return if (aNull == nullsFirst(i)) -1 else 1
      } else {
        val c = orderings(i).compare(a.get(i, fieldTypes(i)), b.get(i, fieldTypes(i)))
        if (c != 0) return if (ascending(i)) c else -c
      }
      i += 1
    }
    0
  }
}

/** One kept row for SortTopK: copied sort-key struct + payload. */
final case class SortTopKEntry(key: InternalRow, value: Any)

/** Bounded heap whose head is the WORST kept entry under the sort
  * order (i.e. the LAST of the kept k).
  */
final class SortTopKBuffer(k: Int, cmp: SortKeyComparator) {
  val entries = new java.util.PriorityQueue[SortTopKEntry](k + 1,
    // max-heap by sort position: head sorts LATEST
    (a: SortTopKEntry, b: SortTopKEntry) => cmp.compare(b.key, a.key))

  def offer(key: InternalRow, value: Any): Unit = {
    if (entries.size() < k) { entries.offer(SortTopKEntry(key, value)); () }
    else if (cmp.compare(key, entries.peek().key) < 0) {
      entries.poll()
      entries.offer(SortTopKEntry(key, value))
      ()
    }
  }

  def sortedBestFirst: Array[SortTopKEntry] = {
    import scala.jdk.CollectionConverters._
    entries.iterator().asScala.toArray
      .sortWith((a, b) => cmp.compare(a.key, b.key) < 0)
  }
}
