package graft.ops

import org.apache.spark.sql.SparkSession

/** Scoped SQL-conf mutation: set key/value pairs, run `body`, restore
  * every key to its prior state in a finally. The one place that
  * owns the null-vs-throw subtlety: `conf.get` can RETURN NULL (not
  * throw) for optional keys with no default — e.g.
  * spark.sql.adaptive.autoBroadcastJoinThreshold — so both the
  * missing-key and the null-value cases restore via `unset`.
  *
  * Only PLANNING forced inside `body` sees the scoped values; AQE
  * re-optimization at EXECUTION time reads the restored session conf
  * (each QueryExecution snapshots conf at creation, but runtime rules
  * like DynamicJoinSelection consult the live session) — pin runtime
  * behavior with plan HINTS, not with conf that this helper restores. */
object ConfScope {
  def withScopedConf[A](spark: SparkSession,
                        scoped: Seq[(String, String)])(body: => A): A = {
    val prev = scoped.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_)) }
    scoped.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
