package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites — one local session per JVM. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  /** Every physical node, traversing INTO adaptive plans and
    * materialized query stages — under AQE both are leaf nodes
    * wrapping the real subtrees, so `collect`/`collectLeaves` on the
    * outer plan never reaches scans or joins. */
  def allNodes(n: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = n.flatMap {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allNodes(q.plan)
    case other => Seq(other)
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(4)
}
