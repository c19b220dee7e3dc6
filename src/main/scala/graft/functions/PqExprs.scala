package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (FAISS-PQ style) as codegen Catalyst
  * expressions. The codebooks — `m` subspaces × `nWords` codewords ×
  * `dims/m` components — are driver-trained constants baked into the
  * expression (shipped once per task via the references array, like a
  * broadcast literal), so encode/scan are pure per-row loops with no
  * join and no shuffle.
  *
  * Scale shape: the corpus is represented by `m` small ints per vector
  * (8 bytes at m=8 vs 512 bytes for a 64-dim double vector — 64×
  * compression), and a query scores a candidate with `m` table lookups
  * instead of `dims` multiplies. That is what makes a memory-resident
  * ANN index over billions of vectors possible.
  */
object PqExprs {

  /** `pq_encode(vec)` → array<int>: per subspace, the index of the
    * nearest (squared-Euclidean) codeword. */
  def pq_encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebooks))

  /** `pq_dist_table(qv)` → array<array<double>>: the query's ADC
    * table — T(j)(w) = ‖q_j − c_{j,w}‖². Computed once per QUERY row
    * (the small side), then every candidate costs m lookups. */
  def pq_dist_table(qv: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqDistTable(ColumnBridge.expression(qv), codebooks))

  /** `pq_adc(code, table)` → double: Σ_j table(j)(code(j)) — the
    * asymmetric distance between a query (via its table) and an
    * encoded corpus vector. */
  def pq_adc(code: Column, table: Column): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(code), ColumnBridge.expression(table)))
}

/** Nearest-codeword encoding; ties break to the lowest codeword index
  * (same convention as IvfIndex's cell argmin). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(PqEncode.encode(v, codebooks))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.PqEncode.encode($v, $cb));
      """
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** Shared by eval and generated code: one tight loop, no allocation
    * beyond the m-int result. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]]): Array[Int] = {
    val m = cb.length
    val sub = v.numElements() / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val words = cb(j)
      var best = Double.MaxValue; var bi = 0; var w = 0
      while (w < words.length) {
        val cw = words(w)
        var d = 0.0; var t = 0
        while (t < sub) {
          val diff = v.getDouble(j * sub + t) - cw(t)
          d += diff * diff; t += 1
        }
        if (d < best) { best = d; bi = w }
        w += 1
      }
      codes(j) = bi
      j += 1
    }
    codes
  }
}

/** Per-query ADC distance table over the codebook constant. */
case class PqDistTable(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(PqDistTable.table(v, codebooks)
      .map(row => new GenericArrayData(row): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        ${ev.value} = graft.functions.PqDistTable.tableData($v, $cb);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "pq_dist_table"
}

object PqDistTable {
  def table(v: ArrayData, cb: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val m = cb.length
    val sub = v.numElements() / m
    val out = new Array[Array[Double]](m)
    var j = 0
    while (j < m) {
      val words = cb(j)
      val row = new Array[Double](words.length)
      var w = 0
      while (w < words.length) {
        val cw = words(w)
        var d = 0.0; var t = 0
        while (t < sub) {
          val diff = v.getDouble(j * sub + t) - cw(t)
          d += diff * diff; t += 1
        }
        row(w) = d; w += 1
      }
      out(j) = row
      j += 1
    }
    out
  }

  def tableData(v: ArrayData, cb: Array[Array[Array[Double]]]): GenericArrayData =
    new GenericArrayData(table(v, cb).map(r => new GenericArrayData(r): Any))
}

/** ADC lookup-sum — the per-candidate hot path: m array reads, no
  * multiplies. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(code: Any, table: Any): Any = {
    val c = code.asInstanceOf[ArrayData]
    val t = table.asInstanceOf[ArrayData]
    var sum = 0.0
    var j = 0
    val m = c.numElements()
    while (j < m) {
      sum += t.getArray(j).getDouble(c.getInt(j))
      j += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      s"""
        int $m = $c.numElements();
        double $sum = 0.0;
        for (int $j = 0; $j < $m; $j++) {
          $sum += $t.getArray($j).getDouble($c.getInt($j));
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}
