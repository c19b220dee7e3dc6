package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column profiling — the data-quality survey every ingest runs
  * before trusting a new table (the reference validates per-field at
  * its API boundary, `middleware/validate.js`; a warehouse does it
  * set-wise): one row per profiled column with row/null/distinct
  * counts, string-rendered min/max, and the mean for numerics.
  *
  * ONE aggregation pass over the table produces every column's stats
  * simultaneously (a per-column loop would rescan the table k times);
  * the single wide result row is then unpivoted with `stack` — cheap,
  * it's one row. Means go through exact DECIMAL(27,6) sums (order-
  * independent, engine-exact for ≤6-dp inputs) surfaced as rounded
  * DOUBLE — the repo-wide oracle-parity convention.
  *
  * Exact distinct counts plan an Expand (one duplicated stream per
  * distinct column) — fine into the tens of columns; at 100 TB set
  * `exactDistinct = false` to swap in HLL++ (approx_count_distinct),
  * which partial-aggregates map-side with no Expand at all. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val nd =
        if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      val mean = df.schema(c).dataType match {
        case _: NumericType =>
          round(sum(col(c).cast("decimal(27,6)")).cast("double") /
            count(col(c)), 6)
        case _ => lit(null).cast("double")
      }
      Seq(count(col(c)).as(s"__nn_$c"), nd.cast("long").as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"), mean.as(s"__mean_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val tuples = cols.map(c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__min_$c`, `__max_$c`, `__mean_$c`")
      .mkString(", ")
    wide.selectExpr("__n",
        s"stack(${cols.size}, $tuples) AS " +
          "(col_name, __nn, n_distinct, min_s, max_s, mean)")
      .select(col("col_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_nulls"), col("n_distinct"),
        col("min_s"), col("max_s"), col("mean"))
  }
}
