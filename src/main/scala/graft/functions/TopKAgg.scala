package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most `k` entries, each an UnsafeRow of
  * (ord₀ … ordₙ₋₁, payload), kept as a MIN-heap under the ord-prefix
  * ordering so the smallest retained entry is evicted first. Mergeable
  * (heap-insert the other side's entries) — the algebraic property
  * that lets Spark partial-aggregate map-side. */
private[functions] final class TopKBuf(val k: Int,
                                       ord: Ordering[InternalRow]) {
  // scala PriorityQueue dequeues the MAX of its ordering → reverse for
  // a min-heap (head = weakest entry, the eviction candidate)
  private val rowOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
    def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
  }
  val heap: mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow](rowOrd.reverse)

  def insert(row: UnsafeRow): Unit =
    if (heap.size < k) heap.enqueue(row)
    else if (ord.compare(row, heap.head) > 0) { heap.dequeue(); heap.enqueue(row) }

  def sortedDesc: Array[UnsafeRow] = heap.toArray.sorted(rowOrd.reverse)
}

/** `topk_rows(payload, ord…, k)` → array of the k payloads with the
  * LARGEST (ord₀ … ordₙ₋₁) tuples in the group, sorted descending.
  *
  * The scale-out top-k-per-group: a window `row_number` must SORT
  * every group's full row set after shuffling all of it; this
  * aggregate carries at most k entries per group through the partial/
  * final combine, so the map side already discards everything below
  * each partition's local top-k and the shuffle moves O(groups · k)
  * rows regardless of group size — the difference between a sort of
  * the fact table and a bounded sketch per key at 100 TB.
  *
  * Determinism: give a TOTAL ord (tie-break columns) or boundary ties
  * are arbitrary, exactly as with window row_number. Rows with a NULL
  * in any ord key are skipped (SQL top-k over non-null ranks).
  * Entries are UnsafeProjection copies — safe against Spark's reused
  * input rows. */
case class TopKRowsAgg(
    payload: Expression, ordKeys: Seq[Expression], k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, "topk_rows: k must be positive")
  require(ordKeys.nonEmpty, "topk_rows: need at least one ord key")

  override def children: Seq[Expression] = payload +: ordKeys
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = payload.nullable)

  private lazy val entrySchema =
    StructType(ordKeys.zipWithIndex.map { case (e, i) =>
      StructField(s"o$i", e.dataType, e.nullable)
    } :+ StructField("p", payload.dataType, payload.nullable))
  @transient private lazy val proj = UnsafeProjection.create(entrySchema)
  private lazy val ordering: Ordering[InternalRow] =
    InterpretedOrdering.forSchema(ordKeys.map(_.dataType))

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k, ordering)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val vals = new Array[Any](ordKeys.size + 1)
    var i = 0
    while (i < ordKeys.size) {
      val v = ordKeys(i).eval(input)
      if (v == null) return buf // null ord key: unranked, skip
      vals(i) = v
      i += 1
    }
    vals(ordKeys.size) = payload.eval(input)
    buf.insert(proj(new GenericInternalRow(vals)).copy())
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    b.heap.foreach(a.insert)
    a
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(buf.sortedDesc.map(r =>
      r.get(ordKeys.size, payload.dataType): Any))

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(entrySchema.size)
      row.pointTo(arr, len)
      buf.insert(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(payload = newChildren.head, ordKeys = newChildren.tail)
  override def prettyName: String = "topk_rows"
}

object TopKAgg {
  def topk_rows(payload: Column, ordKeys: Seq[Column], k: Int): Column =
    ColumnBridge.column(TopKRowsAgg(ColumnBridge.expression(payload),
      ordKeys.map(ColumnBridge.expression), k).toAggregateExpression())
}
