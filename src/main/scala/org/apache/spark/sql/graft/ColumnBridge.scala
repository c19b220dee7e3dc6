package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column conversions for custom Catalyst expressions.
  * Spark 4 made these `private[sql]` (Connect refactor), so the
  * accessor lives in an org.apache.spark.sql subpackage — the
  * standard pattern for third-party Catalyst extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Plan-level internal access for iterative kernels. */
object PlanBridge {

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]` in the Spark 4 Connect refactor). Used by
    * optimizer rules that must EXECUTE a matched subtree — e.g.
    * [[graft.analytics.ResultCacheRule]] materializing a cache entry
    * from the probed aggregate plan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-wrap a MATERIALIZED frame (localCheckpoint'ed) as a fresh
    * LogicalRDD leaf with DEFAULT statistics — zero-copy: the internal
    * row RDD is reused, no job runs, and the checkpointed blocks stay
    * the storage.
    *
    * Why this exists: `Dataset.localCheckpoint` copies the SOURCE
    * plan's estimated `Statistics` onto the resulting LogicalRDD. In
    * an iterative self-join loop (connected components, PageRank…)
    * those estimates COMPOUND — `sizeInBytes` is a BigInt that joins
    * multiply and a self-join SQUARES, so its digit count doubles
    * every round and by round ~20 the driver spends its entire time
    * inside BigInteger.multiply during stats estimation (observed:
    * minutes of single-threaded Toom-Cook on a 5 000-row label
    * frame). Resetting the leaf stats each round keeps every plan's
    * sizeInBytes a bounded product of per-round factors. */
  def freshLeaf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // ROOT-level LogicalRDD only: reuse the PERSISTED RDD itself (not
    // a physical-plan wrapper), so CacheScope.freeCheckpointBlocks on
    // the rewrapped frame unpersists the actual checkpoint blocks. A
    // DERIVED plan over a checkpoint (projection, filter …) must fail
    // loudly here — pairing some INNER LogicalRDD with the outer
    // df.schema would reinterpret its rows under the wrong schema and
    // silently corrupt data.
    val rdd = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => throw new IllegalArgumentException(
        "freshLeaf expects a directly-checkpointed frame (root " +
          s"LogicalRDD); got ${other.nodeName} — rewrap the checkpoint " +
          "BEFORE deriving plans from it")
    }
    cs.internalCreateDataFrame(rdd, df.schema)
  }
}
