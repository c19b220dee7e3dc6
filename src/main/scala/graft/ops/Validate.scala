package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Constraint validation — the reference's PK/FK/UNIQUE/CHECK surface
  * (SURVEY §1.2: Spark enforces none of these declaratively, so they
  * become set-based audit operators). Each check returns the
  * VIOLATING rows (empty frame = constraint holds): composable into
  * ingest gates or data-quality reports.
  */
object Validate {

  /** Primary-key / UNIQUE violations: key groups with more than one
    * row (e.g. Stocks(symbol,timestamp) schema.sql:9, users.email
    * schema.sql:15, review UNIQUE(listid,userid) schema.sql:48). */
  def primaryKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Foreign-key violations: child rows whose key has no parent
    * (e.g. Holdings.portfolioid → Portfolio, schema.sql:93). One
    * anti-join; broadcast the parent key set when it is a dimension. */
  def foreignKey(child: DataFrame, parent: DataFrame,
                 childKeys: Seq[String], parentKeys: Seq[String]): DataFrame = {
    val parentSel = parent.select(
      parentKeys.zip(childKeys).map { case (p, c) => col(p).as(c) }: _*).distinct()
    child.join(parentSel, childKeys, "left_anti")
  }

  /** CHECK-constraint violations: rows failing the predicate
    * (e.g. Holdings.Shares >= 0 schema.sql:95, request.status IN (...)
    * schema.sql:30). */
  def check(df: DataFrame, pred: Column): DataFrame = df.filter(!pred)

  /** Run a suite of named checks and return a summary frame
    * (check_name, n_violations) — the shape a data-quality dashboard
    * ingests. Violations are counted, not collected. */
  def audit(checks: Map[String, DataFrame]): Seq[(String, Long)] =
    checks.toSeq.sortBy(_._1).map { case (name, df) => name -> df.count() }
}
