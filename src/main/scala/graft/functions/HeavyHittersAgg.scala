package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary: at most `k` counters,
  * MERGEABLE (counter-wise add, then subtract the (k+1)-largest count
  * and drop non-positive — the standard mergeable form), single-pass.
  * The vocabulary/heavy-hitter path that scales where an exact
  * `groupBy(token).count()` would shuffle the full token stream:
  * per-partition summaries are k counters each, merged map-side.
  *
  * Guarantees: every item with true frequency > n/(k+1) is present;
  * reported counts underestimate by at most the total decrement. And
  * EXACT-AT-CAPACITY: while the number of DISTINCT items in a group
  * is ≤ k, no decrement ever fires (insert only decrements at k
  * occupied counters with a novel item; merge only normalizes above
  * k counters), so every count is exact and the summary is
  * deterministic under any merge order — the regime the gate query
  * pins with a plain GROUP BY oracle. */
private[functions] final class MgSketch(val k: Int) {
  var n: Long = 0L
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def insert(x: String): Unit = {
    n += 1
    counts.get(x) match {
      case Some(c) => counts.update(x, c + 1)
      case None if counts.size < k => counts.update(x, 1L)
      case None =>
        // classic MG decrement-all; drop exhausted counters
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (_, c) => c - 1 }
        counts.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(counts.remove)
    }
  }

  def merge(other: MgSketch): Unit = {
    n += other.n
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count, keep positives
      val kth = counts.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace { (_, c) => c - kth }
      counts.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(counts.remove)
    }
  }

  /** Counters sorted (count desc, item asc) — deterministic. */
  def sorted: Array[(String, Long)] =
    counts.toArray.sortBy { case (item, c) => (-c, item) }
}

/** `heavy_hitters(x, k)` → array<struct<item, cnt>> sorted by count
  * descending (item ascending tie-break). */
case class HeavyHittersAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch] with ExpectsInputTypes {

  require(k > 0)

  override def children: Seq[Expression] = Seq(child)
  // analysis-time coercion/rejection instead of an executor-side
  // ClassCastException (the function is SQL-exposed via extensions)
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): MgSketch = new MgSketch(k)

  override def update(buf: MgSketch, input: InternalRow): MgSketch = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: MgSketch, b: MgSketch): MgSketch = { a.merge(b); a }

  override def eval(buf: MgSketch): Any =
    new GenericArrayData(buf.sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c)): Any
    })

  override def serialize(buf: MgSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (key, c) =>
      // length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps at
      // 64 KiB and a web corpus can carry an unbroken base64/minified blob
      val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MgSketch(k)
    s.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val key = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      s.counts.update(key, in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {
  def heavy_hitters(x: Column, k: Int): Column =
    ColumnBridge.column(
      HeavyHittersAgg(ColumnBridge.expression(x), k).toAggregateExpression())
}
