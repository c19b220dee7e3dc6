package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated by any other
  * — q dominates p when q is ≥ p on the maximize axis and ≤ p on the
  * minimize axis with at least one strict. The "best tradeoffs" query
  * (cheapest part at every size class and better) the reference's
  * catalog pages (`stocks.js` screeners) circle around without ever
  * computing.
  *
  * Shape — NOT the textbook self-anti-join (that's O(n²) and plans a
  * cartesian): dominance within an equal maximize-value class is
  * decided by `min(minimize)` alone, so one map-side-combined agg
  * collapses the input to ≤ |distinct maximize values| frontier
  * candidates. The cross-class sweep (a running min over candidates
  * sorted by maximize desc) then runs on that bounded frame — the
  * only global sort in the plan sorts candidate rows, never the
  * input. Survivors broadcast back as a semi-join key set. Full-data
  * work: one agg + one broadcast semi-join, both shuffle-minimal.
  * Ties on BOTH axes are mutually non-dominating and all kept (the
  * semi-join keys on the (max, min) value pair).
  */
object Skyline {

  /** @param df          input rows
    * @param maximizeCol axis where larger is better
    * @param minimizeCol axis where smaller is better
    * @return the input rows on the Pareto frontier */
  def skyline2d(df: DataFrame, maximizeCol: String,
                minimizeCol: String): DataFrame = {
    val cand = df.groupBy(col(maximizeCol).as("__mx"))
      .agg(min(col(minimizeCol)).as("__mn"))
    // running min of __mn over STRICTLY larger __mx (row frame is
    // exact here: one row per distinct __mx)
    val sweep = Window.orderBy(col("__mx").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = cand
      .withColumn("__best", min(col("__mn")).over(sweep))
      // dominated iff some larger class reaches price ≤ ours
      .filter(col("__best").isNull || col("__mn") < col("__best"))
      .select(col("__mx"), col("__mn"))
    df.join(broadcast(frontier),
        col(maximizeCol) === col("__mx") && col(minimizeCol) === col("__mn"),
        "left_semi")
  }
}
