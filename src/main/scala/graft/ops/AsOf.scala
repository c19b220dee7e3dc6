package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, LongType, StructField, StructType, TimestampType}

/** As-of join — for every left row, the closest right row on the same
  * key in the requested DIRECTION (the generalization of the
  * reference's latest-price-at-time pattern, SURVEY J11: its
  * `timestamp::date <= CURRENT_DATE ORDER BY timestamp DESC LIMIT 1`
  * probe is a backward as-of at NOW, issued once per row from app
  * code). Directions (pandas merge_asof parity):
  *
  *   - `backward` (default): most recent right row with
  *     `right.ts <= left.ts`;
  *   - `forward`: earliest right row with `right.ts >= left.ts`;
  *   - `nearest`: whichever of the two is closer in time, the
  *     backward match winning exact-distance ties (and distance-0
  *     matches arriving through it).
  *
  * Spark has no native as-of; the scalable formulation is the
  * union-merge: tag both inputs, union them, and per key carry the
  * neighboring right-side ROW across with `last(..., ignoreNulls)` /
  * `first(..., ignoreNulls)` over (key, ts) — ONE shuffle on the key,
  * one local sort (nearest's two carries share it: same partitioning
  * and ordering, only the frames differ), no range self-join blowup,
  * no per-row probing. Tie handling on equal (key, ts): for backward
  * and nearest, right rows sort before left rows so a simultaneous
  * quote is visible to the event (matching `<=`); for forward the
  * encoding flips so the frame starting at the left row still sees it
  * (matching `>=`).
  *
  * The carry is a STRUCT of all valueCols plus the matched right ts
  * and a presence marker, not per-column `last(ignoreNulls)`: a
  * matched right row whose value column is legitimately NULL must
  * surface that NULL (as DuckDB's ASOF JOIN does), not skip to an
  * older non-null value. Right-side ties at identical (key, ts)
  * resolve deterministically by the valueCols tuple (the struct
  * participates in the window ordering): backward takes the greatest,
  * forward the least.
  *
  * `nearest` compares distances in exact integer arithmetic
  * (µs for timestamps, days for dates, the raw value for numerics).
  * There is no tolerance parameter by design: pass `carryRightTs` to
  * surface the matched right timestamp and null out or filter
  * out-of-tolerance carries with one `when` — composition beats a
  * parameter the caller can't inspect afterwards.
  */
object AsOf {

  /** Exact integer position of a ts for distance arithmetic. */
  private def tsNum(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case TimestampType => unix_micros(c)
      case DateType => datediff(c, to_date(lit("1970-01-01")))
      case _ => c.cast(LongType)
    }

  /** @param valueCols    right-side columns to carry (must not collide
    *                     with left column names)
    * @param direction    "backward" (default) | "forward" | "nearest"
    * @param carryRightTs when set, also surface the matched right
    *                     row's timestamp under this name (null when
    *                     unmatched) — the hook for tolerance filters
    * @return left rows + carried right `valueCols` (null when no
    *         right row matches in the direction) */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, valueCols: Seq[String],
           direction: String = "backward",
           carryRightTs: Option[String] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction '$direction'")
    val leftCols = left.columns.toSeq
    val rTsType = right.schema(rightTs).dataType
    // nearest compares integer distances normalized per ts TYPE; a
    // type mismatch (date vs timestamp) would mix days with µs after
    // the union's implicit coercion
    require(direction != "nearest" || left.schema(leftTs).dataType == rTsType,
      s"nearest as-of needs matching ts types, got " +
        s"${left.schema(leftTs).dataType} vs $rTsType")
    val rvType = StructType(valueCols.map(c => right.schema(c)) ++ Seq(
      StructField("__rts", LongType),
      StructField("__rtsOrig", rTsType),
      StructField("__present", BooleanType, nullable = false)))
    // tie encoding: whoever must be VISIBLE to a same-ts left row
    // sorts so the frame reaches it (see the object doc)
    val (rightSide, leftSide) =
      if (direction == "forward") (1, 0) else (0, 1)
    // normalized shape: keys ++ __ts ++ __side ++ __rv ++ leftCols
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
    val lNorm = l.select(
      (keys.map(col) :+ col("__ts") :+ col("__side") :+
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(rightSide))
    val rNorm = r.select(
      (keys.map(col) :+ col("__ts") :+ col("__side") :+
        struct(valueCols.map(col) ++ Seq(
          tsNum(col(rightTs), rTsType).as("__rts"),
          col(rightTs).as("__rtsOrig"),
          lit(true).as("__present")): _*).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    // __rv in the ordering = deterministic tiebreak among right rows
    // sharing (key, ts); left rows' null __rv sorts first within their
    // (ts, side) group, which is irrelevant — each left row only reads
    // the frame up to / from itself. Structs with unorderable fields
    // (maps) can't join the ordering — those carries fall back to
    // (ts, side) with right-side ties left engine-ordered, as before.
    val rvOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(rvType)
    val ord =
      if (rvOrderable) Seq(col("__ts"), col("__side"), col("__rv"))
      else Seq(col("__ts"), col("__side"))
    val part = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wBack = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = lNorm.unionByName(rNorm)
    val carried = direction match {
      case "backward" =>
        unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(wBack))
      case "forward" =>
        unioned.withColumn("__rv", first(col("__rv"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        // both carries ride ONE sort (same partition + ordering, two
        // frames); bw sees distance-0 matches, fw is strictly-after,
        // so min-distance with bw winning ties is exactly "nearest"
        val lts = tsNum(col("__ts"), rTsType)
        val withBoth = unioned
          .withColumn("__bw", last(col("__rv"), ignoreNulls = true).over(wBack))
          .withColumn("__fw", first(col("__rv"), ignoreNulls = true).over(wFwd))
        withBoth.withColumn("__rv",
          when(col("__bw").isNull, col("__fw"))
            .when(col("__fw").isNull, col("__bw"))
            .when(col("__fw").getField("__rts") - lts <
              lts - col("__bw").getField("__rts"), col("__fw"))
            .otherwise(col("__bw")))
          .drop("__bw", "__fw")
    }
    carried.filter(col("__side") === leftSide)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col("__rv").getField(c).as(c)) ++
        carryRightTs.map(n => col("__rv").getField("__rtsOrig").as(n)).toSeq: _*)
  }
}
