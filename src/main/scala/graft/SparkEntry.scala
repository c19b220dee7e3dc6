package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real logic lives in graft.api.QueryCatalog and the library
  * packages (graft.ops / graft.analytics / graft.domain / graft.pipeline).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The one-pass statistics job (SURVEY §3 trace 1): beta per series
    * computed from a single lag-window frame — the rewrite of the
    * reference's N+1 per-symbol loop. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.queries("a4_beta")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryCatalog.oracles
}
