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

  val entries = new java.util.PriorityQueue[Entry](k + 1,
    (a: Entry, b: Entry) =>
      if (a.ord != b.ord) java.lang.Double.compare(a.ord, b.ord)
      else java.lang.Long.compare(b.tie, a.tie))

  def offer(ord: Double, tie: Long, value: Any): Unit = {
    if (entries.size() < k) { entries.offer(Entry(ord, tie, value)); () }
    else {
      val worst = entries.peek()
      val better = ord > worst.ord || (ord == worst.ord && tie < worst.tie)
      if (better) {
        entries.poll()
        entries.offer(Entry(ord, tie, value))
        ()
      }
    }
  }

  /** Best-first: highest ord, then lowest tie. */
  def sortedBestFirst: Array[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.iterator().asScala.toArray
      .sortWith((a, b) => a.ord > b.ord || (a.ord == b.ord && a.tie < b.tie))
  }
}

object TopKBuffer {
  type Entry = TopKEntry
  private[functions] def Entry(ord: Double, tie: Long, value: Any): TopKEntry =
    TopKEntry(ord, tie, value)
}
