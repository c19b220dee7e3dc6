package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass cosine similarity over two double arrays — a custom
  * Catalyst expression replacing the `aggregate(zip_with(...))`
  * higher-order-function composition (HOF lambdas are interpreted
  * per element; this is one tight generated loop per row).
  *
  * Accumulation order matches the sequential HOF/SQL formulation
  * (separate left-to-right sums for dot, |a|², |b|²), so results are
  * bit-identical to `dot/(sqrt(na)*sqrt(nb))` computed elementwise —
  * the DuckDB oracle parity is preserved.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = $x.getDouble($i);
          double $yv = $y.getDouble($i);
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity"
}

/** Dot product over two double arrays — same one-loop rationale. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += $x.getDouble($i) * $y.getDouble($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Element-wise a − b over two double arrays (result length = the
  * shorter input) — one generated loop; used for PQ residual encoding
  * (vector minus its coarse centroid). */
case class VectorSub(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getDouble(i) - y.getDouble(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double[] $out = new double[$n];
        for (int $i = 0; $i < $n; $i++) {
          $out[$i] = $x.getDouble($i) - $y.getDouble($i);
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sub"
}

/** x / ‖x‖₂ over a double array (zero vectors pass through unchanged) —
  * one generated loop per row; a `transform(v, x => x / sqrt(dot(v,v)))`
  * HOF would re-evaluate the norm per ELEMENT (O(d²) per row). */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0; var i = 0
    while (i < n) { val v = x.getDouble(i); ss += v * v; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = if (norm == 0.0) x.getDouble(i) else x.getDouble(i) / norm
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      s"""
        int $n = $x.numElements();
        double $ss = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double v = $x.getDouble($i);
          $ss += v * v;
        }
        double $norm = java.lang.Math.sqrt($ss);
        double[] $out = new double[$n];
        for (int $i = 0; $i < $n; $i++) {
          $out[$i] = $norm == 0.0 ? $x.getDouble($i) : $x.getDouble($i) / $norm;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "l2_normalize"
}

object VectorExprs {
  /** Both inputs must be array<double> (use Similarity.vecD to cast). */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2_normalize(v: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(v)))

  def vec_sub(a: Column, b: Column): Column =
    ColumnBridge.column(VectorSub(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
