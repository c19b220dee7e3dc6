package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-kernel expressions for the dedup hot path. */
object TextExprs {

  /** `shingle_hashes(tokens, n)` → array<long>: the DISTINCT xxhash64
    * values of the doc's word n-gram shingles, computed in one
    * generated loop. Replaces the interpreted-HOF composition
    * `array_distinct(transform(idxs, i => array_join(slice(...))))`
    * + string explode + `xxhash64(shingle)` — per element that paid
    * lambda interpretation, a slice allocation, a join allocation,
    * and a second projection pass; this pays one concat + one hash.
    * Hash values are IDENTICAL to `xxhash64(<shingle string>)`
    * (same XxHash64Function, seed 42), so downstream plans, planted
    * oracles, and signature schemes are unchanged. */
  def shingle_hashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n))

  /** `simhash64(tokens)` → long (see [[SimHash64]]). */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}

/** `simhash64(tokens)` → long: the 64-bit SimHash of the token
  * MULTISET, computed per row — no explode, no (id, token) shuffle,
  * no 64-column aggregate. Bit i is set iff the count-weighted sum of
  * ±1 over distinct token hashes (bit i of the hash picks the sign)
  * is positive — exactly the semantics of the two-stage DataFrame
  * formulation it replaces (same per-token xxhash64, seed 42), so
  * signatures are bit-identical and the planted-equality oracle
  * design carries over unchanged. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        ${ev.value} = graft.functions.SimHash64.compute($v);
      """
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    // distinct-token counts: the 64 signed sums weight each distinct
    // hash by its occurrence count (±count ≡ sum of ±1 per occurrence)
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
      val c = counts.get(h)
      if (c == null) counts.put(h, Array(1L)) else c(0) += 1L
      i += 1
    }
    val sums = new Array[Long](64)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = e.getKey.longValue()
      val cnt = e.getValue()(0)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += cnt else sums(b) -= cnt
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.compute(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.ShingleHashes.compute($v, $n));
      """
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private val SEP = UTF8String.fromString(" ")

  /** Distinct shingle hashes, first-occurrence order. Shared by eval
    * and generated code. */
  def compute(toks: ArrayData, n: Int): Array[Long] = {
    val m = toks.numElements() - n + 1
    if (m <= 0) return Array.emptyLongArray
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var k = 0
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(SEP, parts: _*)
      val h = XxHash64Function.hash(s, StringType, 42L)
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    if (k == m) out else java.util.Arrays.copyOf(out, k)
  }
}
