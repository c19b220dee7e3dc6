package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One Greenwald-Khanna tuple: `v` with rank uncertainty `(g, del)` —
  * rmin(i) = Σ_{j≤i} g_j, rmax(i) = rmin(i) + del_i. */
private[functions] final case class GkTuple(v: Double, g: Long, del: Long)

/** Greenwald-Khanna ε-approximate quantile summary: bounded-memory,
  * MERGEABLE, single-pass — the percentile path that scales where
  * `percentile()`'s exact per-group sort (a9) cannot: O((1/ε)·log(εn))
  * tuples per group instead of O(n), and partial aggregation works
  * map-side (GK summaries merge by sorted-union + compress).
  *
  * EXACT-AT-CAPACITY: no tuple can be compressed while 2εn < 2 (the
  * merge condition g_i + g_{i+1} + del_{i+1} ≤ ⌊2εn⌋ needs ≥ 2), so
  * for n ≤ 1/(2ε) every inserted value is retained with g=1, del=0
  * and queries return the EXACT rank-⌈qn⌉ element, deterministically,
  * regardless of partial-merge order. Beyond capacity, a single-level
  * merge keeps rank error within 2εn (the bound QuantileSketchSpec
  * pins); under DEEP partial-merge trees the sorted-union merge here
  * does not inflate `del` for cross-summary rank uncertainty, so the
  * effective error can drift toward the sum of sub-summary errors —
  * callers needing strict ε after many merge levels should lower eps
  * accordingly. The gate query pins the exact regime.
  */
private[functions] final class GkSketch(val eps: Double) {
  var n: Long = 0L
  var tuples: ArrayBuffer[GkTuple] = ArrayBuffer.empty

  private def threshold: Long = math.floor(2 * eps * n).toLong

  def insert(v: Double): Unit = {
    // binary search for the first tuple with value > v
    var lo = 0; var hi = tuples.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (tuples(mid).v <= v) lo = mid + 1 else hi = mid
    }
    n += 1
    val del = if (lo == 0 || lo == tuples.length) 0L
              else math.max(0L, threshold - 1)
    tuples.insert(lo, GkTuple(v, 1L, del))
    // amortize: compress when the summary outgrows ~3/(2ε)
    if (tuples.length > math.max(16L, 3L * math.ceil(1.0 / (2 * eps)).toLong))
      compress()
  }

  def compress(): Unit = {
    if (tuples.length < 3) return
    val t = threshold
    val out = ArrayBuffer.empty[GkTuple]
    // right-to-left greedy merge; first and last tuples are never
    // absorbed (they anchor min/max exactly)
    var i = tuples.length - 1
    var cur = tuples(i)
    i -= 1
    while (i >= 1) {
      val prev = tuples(i)
      if (prev.g + cur.g + cur.del <= t) {
        cur = GkTuple(cur.v, prev.g + cur.g, cur.del)
      } else {
        out.prepend(cur)
        cur = prev
      }
      i -= 1
    }
    out.prepend(cur)
    if (tuples.nonEmpty) out.prepend(tuples(0))
    tuples = out
  }

  /** Sorted-union merge (Greenwald-Khanna merge): rank uncertainties
    * carry over; compress afterwards. */
  def merge(other: GkSketch): Unit = {
    if (other.n == 0) return
    if (n == 0) { n = other.n; tuples = other.tuples.clone(); return }
    val merged = new ArrayBuffer[GkTuple](tuples.length + other.tuples.length)
    var i = 0; var j = 0
    while (i < tuples.length && j < other.tuples.length) {
      if (tuples(i).v <= other.tuples(j).v) { merged += tuples(i); i += 1 }
      else { merged += other.tuples(j); j += 1 }
    }
    while (i < tuples.length) { merged += tuples(i); i += 1 }
    while (j < other.tuples.length) { merged += other.tuples(j); j += 1 }
    tuples = merged
    n += other.n
    compress()
  }

  /** Value whose rank is within ⌊εn⌋ of ⌈q·n⌉. In the exact regime
    * (n ≤ 1/(2ε)) this is the exact rank-⌈qn⌉ order statistic. */
  def query(q: Double): Double = {
    require(tuples.nonEmpty, "empty sketch")
    val r = math.max(1L, math.ceil(q * n).toLong)
    val e = math.floor(eps * n).toLong
    var rmin = 0L
    var i = 0
    while (i < tuples.length) {
      rmin += tuples(i).g
      val rmax = rmin + tuples(i).del
      if (r - rmin <= e && rmax - r <= e) return tuples(i).v
      i += 1
    }
    tuples.last.v
  }
}

/** `quantile_sketch(x, [q...], eps)` — grouped GK quantiles as a
  * custom TypedImperativeAggregate. Returns array<double>, one entry
  * per requested quantile. */
case class QuantileSketchAgg(
    child: Expression, quantiles: Seq[Double], eps: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkSketch] with ExpectsInputTypes {

  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1))
  require(eps > 0 && eps < 0.5)

  override def children: Seq[Expression] = Seq(child)
  // analysis-time coercion/rejection instead of an executor-side
  // ClassCastException (the function is SQL-exposed via extensions)
  override def inputTypes = Seq(DoubleType)
  // NULL on empty/all-null groups, like the built-in percentile aggs
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): GkSketch = new GkSketch(eps)

  override def update(buf: GkSketch, input: InternalRow): GkSketch = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: GkSketch, b: GkSketch): GkSketch = { a.merge(b); a }

  override def eval(buf: GkSketch): Any =
    if (buf.n == 0) null
    else new GenericArrayData(quantiles.map(buf.query).toArray)

  override def serialize(buf: GkSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.tuples.length)
    buf.tuples.foreach { t =>
      out.writeDouble(t.v); out.writeLong(t.g); out.writeLong(t.del)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GkSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new GkSketch(eps)
    s.n = in.readLong()
    val len = in.readInt()
    s.tuples = new ArrayBuffer[GkTuple](len)
    var i = 0
    while (i < len) {
      s.tuples += GkTuple(in.readDouble(), in.readLong(), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAgg {
  /** Column-API form: `quantile_sketch($"x", Seq(0.5, 0.95), 1e-4)`. */
  def quantile_sketch(x: Column, qs: Seq[Double], eps: Double): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(x), qs, eps)
        .toAggregateExpression())
}
