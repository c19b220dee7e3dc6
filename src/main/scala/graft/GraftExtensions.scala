package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.HoldingFoldAgg

/** Session-extension wiring for cluster deployment: ship the jar and
  * set `spark.sql.extensions=graft.GraftExtensions` — every session
  * (including Thrift/Connect ones that never run Scala code) gets the
  * engine's SQL functions. Local sessions get the same via
  * GraftSession / HoldingFoldAgg.register. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("hold_fold"),
      new ExpressionInfo(classOf[HoldingFoldAgg].getName, "hold_fold"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HoldingFoldAgg(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4))))
  }
}
