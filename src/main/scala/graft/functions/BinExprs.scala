package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Equi-depth binning against a driver-computed sorted boundary
  * array, as a codegen Catalyst expression.
  *
  * `sorted_bin(v)` = |{ b ∈ bounds : b ≤ v }| — the same contract as
  * the higher-order `size(filter(bounds, b -> b <= v))` it replaces in
  * [[graft.catalog.ZOrder]], but O(log n) binary search instead of an
  * O(n) interpreted lambda sweep, no per-row array allocation, and it
  * stays inside whole-stage codegen (HOFs are CodegenFallback, which
  * also knocks the surrounding projection out of codegen). The bounds
  * ship once per task through the codegen references array, like a
  * broadcast literal.
  */
object BinExprs {

  /** Bin id in [0, bounds.length] for `c` (cast to double) against
    * ascending `bounds`. */
  def sorted_bin(c: Column, bounds: Array[Double]): Column =
    ColumnBridge.column(
      SortedBinIndex(ColumnBridge.expression(c.cast("double")), bounds))
}

case class SortedBinIndex(child: Expression, bounds: Array[Double])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SortedBinIndex.countLe(bounds, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("binBounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SortedBinIndex.countLe($b, $v);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "sorted_bin"
}

object SortedBinIndex {
  /** Rightmost insertion point: the count of elements ≤ v (duplicate
    * boundaries — flat quantile regions — land every tied value in
    * the bin after the run, matching the filter-count contract). */
  def countLe(bounds: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
