package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One buffered trade inside the aggregation buffer. */
private[functions] final case class TradeEvt(ts: Long, seq: Long, isBuy: Boolean,
                                             qty: Double, price: Double)

/** `hold_fold(ts, seq, side, qty, price)` — the buy/sell average-cost
  * fold (reference `trading.js:83-85,185-199`; SURVEY §2 A8, §7.3) as
  * a custom Catalyst aggregate, giving the ordered fold a SQL surface:
  *
  * {{{
  *   SELECT portfolio, symbol, hold_fold(ts, seq, side, qty, price)
  *   FROM trades GROUP BY portfolio, symbol
  * }}}
  *
  * Returns struct(shares, avg_cost, n_rejected). The recurrence is
  * order-dependent and resets at position close, so it cannot be a
  * Declarative aggregate: the buffer collects the group's trades
  * (partial aggregation and shuffle-side merge just concatenate) and
  * the ordered fold runs once at eval. Memory is O(trades per
  * (portfolio, symbol)) — the same bound as the groupByKey fold in
  * graft.domain.Trading, which remains the preferred Dataset-API
  * path; this class exists for SQL exposure.
  */
case class HoldingFoldAgg(
    ts: Expression, seq: Expression, side: Expression,
    qty: Expression, price: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[TradeEvt]] {

  override def children: Seq[Expression] = Seq(ts, seq, side, qty, price)

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("shares", DoubleType),
    StructField("avg_cost", DoubleType),
    StructField("n_rejected", LongType)))

  override def createAggregationBuffer(): ArrayBuffer[TradeEvt] =
    ArrayBuffer.empty[TradeEvt]

  override def update(buf: ArrayBuffer[TradeEvt], input: InternalRow): ArrayBuffer[TradeEvt] = {
    val t = ts.eval(input)
    val s = seq.eval(input)
    val sd = side.eval(input)
    val q = qty.eval(input)
    val p = price.eval(input)
    if (t != null && s != null && sd != null && q != null && p != null) {
      buf += TradeEvt(t.asInstanceOf[Long], s.asInstanceOf[Long],
        sd.asInstanceOf[UTF8String].toString == "BUY",
        q.asInstanceOf[Double], p.asInstanceOf[Double])
    }
    buf
  }

  override def merge(a: ArrayBuffer[TradeEvt], b: ArrayBuffer[TradeEvt]): ArrayBuffer[TradeEvt] =
    a ++= b

  override def eval(buf: ArrayBuffer[TradeEvt]): Any = {
    var shares = 0.0
    var avg = 0.0
    var rejected = 0L
    buf.sortInPlaceBy(t => (t.ts, t.seq))
    buf.foreach { t =>
      if (t.isBuy) {
        if (shares == 0.0) { shares = t.qty; avg = t.price }
        else { avg = (avg * shares + t.price * t.qty) / (shares + t.qty); shares += t.qty }
      } else {
        if (t.qty > shares) rejected += 1
        else { shares -= t.qty; if (shares == 0.0) avg = 0.0 }
      }
    }
    new GenericInternalRow(Array[Any](shares, avg, rejected))
  }

  override def serialize(buf: ArrayBuffer[TradeEvt]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { t =>
      out.writeLong(t.ts); out.writeLong(t.seq); out.writeBoolean(t.isBuy)
      out.writeDouble(t.qty); out.writeDouble(t.price)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[TradeEvt] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[TradeEvt](n)
    var i = 0
    while (i < n) {
      buf += TradeEvt(in.readLong(), in.readLong(), in.readBoolean(),
        in.readDouble(), in.readDouble())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HoldingFoldAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HoldingFoldAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoldingFoldAgg =
    copy(ts = newChildren(0), seq = newChildren(1), side = newChildren(2),
      qty = newChildren(3), price = newChildren(4))
  override def prettyName: String = "hold_fold"
}

object HoldingFoldAgg {
  /** Column-API form. */
  def hold_fold(ts: Column, seq: Column, side: Column,
                qty: Column, price: Column): Column =
    ColumnBridge.column(
      HoldingFoldAgg(ColumnBridge.expression(ts), ColumnBridge.expression(seq),
          ColumnBridge.expression(side), ColumnBridge.expression(qty),
          ColumnBridge.expression(price))
        .toAggregateExpression())

  /** Register `hold_fold` for spark.sql use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hold_fold",
      exprs => HoldingFoldAgg(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4)),
      "scala_udf")
}
