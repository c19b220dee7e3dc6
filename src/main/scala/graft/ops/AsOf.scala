package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

/** As-of join — for every left row, the most recent right row with
  * `right.ts <= left.ts` on the same key (the generalization of the
  * reference's latest-price-at-time pattern, SURVEY J11: its
  * `timestamp::date <= CURRENT_DATE ORDER BY timestamp DESC LIMIT 1`
  * probe is an as-of at NOW, issued once per row from app code).
  *
  * Spark has no native as-of; the scalable formulation is the
  * union-merge: tag both inputs, union them, and per key carry the
  * last right-side ROW forward with `last(..., ignoreNulls)` over
  * (key, ts) — ONE shuffle on the key, one local sort, no range
  * self-join blowup, no per-row probing. Right rows sort before left
  * rows on ts ties so an exactly-simultaneous quote is visible to the
  * event (matching `<=`).
  *
  * The carry is a STRUCT of all valueCols plus a presence marker, not
  * per-column `last(ignoreNulls)`: a matched right row whose value
  * column is legitimately NULL must surface that NULL (as DuckDB's
  * ASOF JOIN does), not skip back to an older non-null value. Right-
  * side ties at identical (key, ts) resolve deterministically to the
  * greatest valueCols tuple (the struct participates in the window
  * ordering).
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
    val rvType = StructType(valueCols.map(c => right.schema(c)) :+
      StructField("__present", BooleanType, nullable = false))
    // normalized shape: keys ++ __ts ++ __side ++ __rv ++ leftCols
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts AFTER right on ties
    val lNorm = l.select(
      (keys.map(col) :+ col("__ts") :+ col("__side") :+
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rNorm = r.select(
      (keys.map(col) :+ col("__ts") :+ col("__side") :+
        struct(valueCols.map(col) :+ lit(true).as("__present"): _*).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    // __rv in the ordering = deterministic tiebreak among right rows
    // sharing (key, ts); left rows' null __rv sorts first within their
    // (ts, side) group, which is irrelevant — each left row only reads
    // the frame up to itself. Structs with unorderable fields (maps)
    // can't join the ordering — those carries fall back to (ts, side)
    // with right-side ties left engine-ordered, as before.
    val rvOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(rvType)
    val ord =
      if (rvOrderable) Seq(col("__ts"), col("__side"), col("__rv"))
      else Seq(col("__ts"), col("__side"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lNorm.unionByName(rNorm)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col("__rv").getField(c).as(c)): _*)
  }
}
