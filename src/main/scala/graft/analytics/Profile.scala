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
  * One scan-shaped pass per agg FAMILY: the non-distinct stats (a
  * per-column loop would rescan the table k times) aggregate in one
  * plain hash agg, and the exact distinct counts aggregate in a
  * SECOND agg joined back by cross join of two 1-row frames — still a
  * single Spark query. Keeping them apart matters: a mixed
  * distinct/non-distinct agg plans an Expand that multiplies every
  * row by (k+1) streams CARRYING every agg input column (measured 3×
  * slower at sf0.1 than the two-agg shape). The single wide result
  * row is then unpivoted with `stack` — cheap, it's one row. Means go
  * through exact DECIMAL(27,6) sums (order-independent, engine-exact
  * for ≤6-dp inputs) surfaced as rounded DOUBLE — the repo-wide
  * oracle-parity convention.
  *
  * Exact distinct counts still plan an Expand over the pruned
  * distinct columns only — fine into the tens of columns; at 100 TB
  * set `exactDistinct = false` to swap in HLL++
  * (approx_count_distinct), which partial-aggregates map-side with no
  * Expand at all and folds into the main agg. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    def nd(c: String): Column = {
      val e = if (exactDistinct) countDistinct(col(c))
              else approx_count_distinct(col(c))
      e.cast("long").as(s"__nd_$c")
    }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val mean = df.schema(c).dataType match {
        case _: NumericType =>
          round(sum(col(c).cast("decimal(27,6)")).cast("double") /
            count(col(c)), 6)
        case _ => lit(null).cast("double")
      }
      (if (exactDistinct) Seq.empty[Column] else Seq(nd(c))) ++
        Seq(count(col(c)).as(s"__nn_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"), mean.as(s"__mean_$c"))
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
    val wide =
      if (exactDistinct)
        base.crossJoin(df.agg(nd(cols.head), cols.tail.map(nd): _*))
      else base
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

  /** EQUI-WIDTH HISTOGRAM over a numeric column with caller-fixed
    * bounds — the one-pass profiling complement of [[profile]]'s
    * scalar stats and the exact counterpart of the a12 quantile
    * sketch. Fixed `[lo, hi)` bounds keep it single-pass (a
    * data-derived range would need a min/max pre-scan — callers that
    * want it compose `profile` first); out-of-range values CLAMP into
    * the edge bins (width_bucket's under/overflow buckets folded in,
    * so the histogram accounts for every non-null, non-NaN row — a
    * silently-dropped tail misleads exactly when it matters most;
    * NaN, which has no place on the axis, is excluded like NULL
    * rather than smuggled into the top bin).
    * One groupBy on the bin id: map-side combined, `bins` rows out,
    * any corpus size in. Empty bins are absent (callers densify with
    * a `sequence` join if rendering needs zeros). */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
                bins: Int): DataFrame = {
    require(bins >= 1, s"histogram: bins must be >= 1, got $bins")
    require(hi > lo, s"histogram: need hi > lo, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val bin = least(greatest(floor((col(c) - lo) / w), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
    // NaN is not a value on the [lo, hi) axis: Spark orders NaN above
    // every double, so it would otherwise ride greatest/least into the
    // TOP bin and silently inflate the right tail — exclude it like
    // NULL (cast first: isnan only accepts floating input, and an
    // integral column can never produce NaN through the cast)
    df.filter(col(c).isNotNull && !isnan(col(c).cast("double")))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), min(col(c)).as("lo_v"),
        max(col(c)).as("hi_v"))
  }

  /** Z-SCORE OUTLIER DETECTION per group — rows whose value sits more
    * than `z` sample standard deviations from their group's mean,
    * returned with the score as `z_score`. The data-quality screen
    * that runs before training ("drop the 4σ latency spikes") and the
    * simplest anomaly monitor that is still statistically grounded.
    *
    * Two passes by necessity (the mean must exist before any row can
    * be scored), both scale-clean: one hash aggregation to a
    * groups-sized stats frame, then a keyed join back — the stats
    * side is one row per group, so Spark broadcasts it at any fact
    * size. Zero-variance groups produce no outliers by definition
    * (every member IS the mean); NULL values are ignored, not scored.
    * Callers needing a hard reproducibility boundary should pick `z`
    * away from their data's score ties — the group mean is a
    * float sum, order-sensitive at the ~1e-12 level. */
  def outliers(df: DataFrame, keys: Seq[String], value: String,
               z: Double): DataFrame = {
    require(z > 0, s"outliers: z must be > 0, got $z")
    val rows = df.filter(col(value).isNotNull)
    val stats = rows.groupBy(keys.map(col): _*)
      .agg(avg(col(value)).as("__m"), stddev_samp(col(value)).as("__sd"))
    rows.join(stats, keys)
      .filter(col("__sd") > 0 &&
        abs((col(value) - col("__m")) / col("__sd")) > z)
      .withColumn("z_score", (col(value) - col("__m")) / col("__sd"))
      .drop("__m", "__sd")
  }
}
