package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the most recent right row with
  * `right.ts <= left.ts` on the same key (the generalization of the
  * reference's latest-price-at-time pattern, SURVEY J11: its
  * `timestamp::date <= CURRENT_DATE ORDER BY timestamp DESC LIMIT 1`
  * probe is an as-of at NOW, issued once per row from app code).
  *
  * Spark has no native as-of; the scalable formulation is the
  * union-merge: tag both inputs, union them, and per key carry the
  * last right-side values forward with `last(..., ignoreNulls)` over
  * (key, ts) — ONE shuffle on the key, one local sort, no range
  * self-join blowup, no per-row probing. Right rows sort before left
  * rows on ts ties so an exactly-simultaneous quote is visible to the
  * event (matching `<=`).
  */
object AsOf {

  /** @param valueCols right-side columns to carry (must not collide
    *                  with left column names)
    * @return left rows + carried right `valueCols` (null when no
    *         right row precedes the left row) */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // normalized shape: keys ++ __ts ++ __side ++ valueCols ++ leftCols
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts AFTER right on ties
    val lNorm = l.select(
      (keys.map(col) :+ col("__ts") :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rNorm = r.select(
      (keys.map(col) :+ col("__ts") :+ col("__side")) ++
        valueCols.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = lNorm.unionByName(rNorm)
    val carried = valueCols.foldLeft(merged) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++ valueCols.map(col): _*)
  }
}
