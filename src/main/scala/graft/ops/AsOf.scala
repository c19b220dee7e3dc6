package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType, IntegerType, LongType, ShortType, StructField, StructType, TimestampType}

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
  * neighboring right-side ROW across with `last(..., ignoreNulls)`
  * over (key, ts) — ONE shuffle on the key, no range self-join
  * blowup, no per-row probing. BOTH directions run the carry as
  * `last` over a frame ENDING at the current row (ascending ts for
  * backward, descending ts for forward): Spark evaluates
  * UnboundedPreceding..CurrentRow frames incrementally in one pass,
  * where a CurrentRow..UnboundedFollowing frame (the naive forward
  * formulation) rebuilds its aggregate per row — O(rows²) per key.
  * `nearest` computes both carries; they need opposite sort orders,
  * so it pays a SECOND local sort on the same partitioning (still one
  * exchange, no second shuffle).
  *
  * Right rows whose ts is NULL are dropped up front — a NULL
  * timestamp can never satisfy an as-of inequality (pandas/DuckDB
  * parity; unfiltered they'd sort nulls-first and become phantom
  * "oldest" matches). A left row with NULL ts matches nothing.
  *
  * The carry is a STRUCT of all valueCols plus a presence marker
  * (and, only when needed, the matched right ts), not per-column
  * `last(ignoreNulls)`: a matched right row whose value column is
  * legitimately NULL must surface that NULL (as DuckDB's ASOF JOIN
  * does), not skip to an older non-null value. Right-side ties at
  * identical (key, ts) resolve deterministically to the GREATEST
  * valueCols tuple in every direction (the struct participates in the
  * window ordering).
  *
  * `nearest` compares distances in exact arithmetic: integer µs for
  * timestamps, days for dates, the raw value for fractional numerics
  * (a Long cast would truncate 10.6 to 10 and flip near-tie picks).
  * There is no tolerance parameter by design: pass `carryRightTs` to
  * surface the matched right timestamp and null out or filter
  * out-of-tolerance carries with one `when` — composition beats a
  * parameter the caller can't inspect afterwards.
  */
object AsOf {

  /** Exact position of a ts for distance arithmetic (see object doc). */
  private def tsNum(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    case DateType => datediff(c, to_date(lit("1970-01-01")))
    case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
    case _ => c // fractional/decimal: native arithmetic, no truncation
  }

  /** @param valueCols    right-side columns to carry (must not collide
    *                     with left column names)
    * @param direction    "backward" (default) | "forward" | "nearest"
    * @param carryRightTs when set, also surface the matched right
    *                     row's timestamp under this name (null when
    *                     unmatched) — the hook for tolerance filters
    * @return left rows + carried right `valueCols` (null when no
    *         right row matches in the direction) */
  def join(left: DataFrame, right0: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, valueCols: Seq[String],
           direction: String = "backward",
           carryRightTs: Option[String] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction '$direction'")
    val leftCols = left.columns.toSeq
    val rTsType = right0.schema(rightTs).dataType
    // nearest compares distances normalized per ts TYPE; a type
    // mismatch (date vs timestamp) would mix days with µs after the
    // union's implicit coercion
    require(direction != "nearest" || left.schema(leftTs).dataType == rTsType,
      s"nearest as-of needs matching ts types, got " +
        s"${left.schema(leftTs).dataType} vs $rTsType")
    val right = right0.filter(col(rightTs).isNotNull)
    val needDist = direction == "nearest"
    val rvFields =
      valueCols.map(c => StructField(c, right0.schema(c).dataType,
        right0.schema(c).nullable)) ++
        (if (needDist) Seq(StructField("__rts",
          tsNumType(rTsType))) else Nil) ++
        (if (carryRightTs.isDefined) Seq(StructField("__rtsOrig", rTsType))
         else Nil) :+
        StructField("__present", BooleanType, nullable = false)
    val rvType = StructType(rvFields)
    val rvStruct = struct(valueCols.map(col) ++
      (if (needDist) Seq(tsNum(col(rightTs), rTsType).as("__rts")) else Nil) ++
      carryRightTs.map(_ => col(rightTs).as("__rtsOrig")).toSeq :+
      lit(true).as("__present"): _*)
    // normalized shape: keys ++ __ts ++ __side ++ __rv ++ leftCols.
    // Right rows take __side 0: ascending (ts, side) puts a same-ts
    // right row BEFORE the left row (visible to backward's `<=`), and
    // (ts DESC, side ASC) puts it before the left row again (visible
    // to forward's `>=`) — one encoding serves both carries.
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lNorm = l.select(
      (keys.map(col) :+ col("__ts") :+ col("__side") :+
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rNorm = r.select(
      (keys.map(col) :+ col("__ts") :+ col("__side") :+
        rvStruct.as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    // __rv in the ordering = deterministic tiebreak among right rows
    // sharing (key, ts); left rows' null __rv sorts first within their
    // (ts, side) group, which is irrelevant — each left row only reads
    // the frame up to itself. Structs with unorderable fields (maps)
    // can't join the ordering — those carries fall back to (ts, side)
    // with right-side ties left engine-ordered, as before.
    val rvOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(rvType)
    def ordering(tsCol: Column) =
      if (rvOrderable) Seq(tsCol, col("__side"), col("__rv"))
      else Seq(tsCol, col("__side"))
    // both orderings end the frame AT the current row — the
    // incremental (never per-row-rebuilt) window evaluation path
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering(col("__ts")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering(col("__ts").desc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = lNorm.unionByName(rNorm)
    val carried = direction match {
      case "backward" =>
        unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(wBack))
      case "forward" =>
        unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        // bw sees distance-0 matches (same-ts rights precede the left
        // row in BOTH orderings, so fw sees them too — at distance 0
        // the tie rule hands the pick to bw regardless)
        val lts = tsNum(col("__ts"), rTsType)
        val withBoth = unioned
          .withColumn("__bw", last(col("__rv"), ignoreNulls = true).over(wBack))
          .withColumn("__fw", last(col("__rv"), ignoreNulls = true).over(wFwd))
        withBoth.withColumn("__rv",
          when(col("__bw").isNull, col("__fw"))
            .when(col("__fw").isNull, col("__bw"))
            .when(col("__fw").getField("__rts") - lts <
              lts - col("__bw").getField("__rts"), col("__fw"))
            .otherwise(col("__bw")))
          .drop("__bw", "__fw")
    }
    carried.filter(col("__side") === 1)
      // a NULL-ts left row matches nothing (it sorts nulls-last under
      // the forward ordering, where an unguarded frame would hand it
      // the whole right side)
      .withColumn("__rv",
        when(col("__ts").isNull, lit(null).cast(rvType))
          .otherwise(col("__rv")))
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col("__rv").getField(c).as(c)) ++
        carryRightTs.map(n => col("__rv").getField("__rtsOrig").as(n)).toSeq: _*)
  }

  /** Data type [[tsNum]] yields for a given ts type. */
  private def tsNumType(dt: DataType): DataType = dt match {
    case TimestampType => LongType
    case DateType => IntegerType
    case ByteType | ShortType | IntegerType | LongType => LongType
    case other => other
  }
}
