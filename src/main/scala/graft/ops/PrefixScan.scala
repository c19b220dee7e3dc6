package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sums over an ARBITRARY total order — the
  * two-level scan: range-repartition on the order key, per-partition
  * window cumsum, one tiny window over the per-partition totals
  * (numPartitions rows), broadcast-join the partition bases back.
  * Never a global single-partition window.
  *
  * The result is EXACT and independent of where the range boundaries
  * land: base(pid) + local prefix = the global prefix under any split
  * of a total order. The order columns must therefore be collectively
  * duplicate-free (append a unique id as the last column); with ties
  * spanning a boundary the decomposition would be ambiguous.
  *
  * Generalizes the id-sharded scan in TextAnalysis.packSequences to
  * orders that are NOT a pre-sharded key — e.g. "by quality,
  * descending" — at the cost of the range-exchange pass. */
object PrefixScan {

  /** Adds `__prefix` = exclusive prefix sum of `value` in the total
    * order of `orderCols`, and `__rank` = 1-based position. */
  def exclusiveCumSum(df: DataFrame, orderCols: Seq[Column],
                      value: Column, partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty)
    val p = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val local = ranged
      .withColumn("__local",
        coalesce(sum(value).over(
          wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__lrank", row_number().over(wLocal))
    // per-partition totals: ≤ `p` rows — one small task, then a
    // broadcast join carries each partition's base offset back
    val bases = local.groupBy(col("__pid"))
      .agg(sum(value).as("__ptot"), count(lit(1)).as("__pcnt"))
      .withColumn("__base",
        coalesce(sum(col("__ptot")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__rbase",
        coalesce(sum(col("__pcnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__base"), col("__rbase"))
    local.join(broadcast(bases), Seq("__pid"))
      .withColumn("__prefix", col("__base") + col("__local"))
      .withColumn("__rank", col("__rbase") + col("__lrank"))
      .drop("__pid", "__local", "__lrank", "__base", "__rbase")
  }

  /** Data selection under a budget: keep the rows whose EXCLUSIVE
    * prefix of `value` (in `orderCols` order — e.g. quality
    * descending, id as tie-break) is below `budget`. The classic
    * "highest-quality documents until the token budget is spent"
    * training-data cut; the last kept row may straddle the budget. */
  def takeUnderBudget(df: DataFrame, orderCols: Seq[Column],
                      value: Column, budget: Long): DataFrame =
    exclusiveCumSum(df, orderCols, value)
      .filter(col("__prefix") < budget)
}
