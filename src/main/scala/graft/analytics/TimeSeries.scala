package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / statistical analytics — the Spark restatement of the
  * reference's flagship per-portfolio statistics flow
  * (`portfolio.js:319-488`) and price-forecast flow
  * (`chart.js:67-158`, `portfolio.js:491-559`).
  *
  * The reference runs 2 SQL round trips *per held symbol* plus one
  * matrix query (SURVEY.md §3 trace 1 — the N+1 anti-pattern). Here
  * every statistic for every key comes out of ONE pass over the fact
  * table: returns are computed once with a partitioned lag window and
  * all downstream stats are hash aggregations over that single frame.
  */
object TimeSeries {

  /** Daily simple returns per key: (close - lag(close)) / lag(close)
    * over (key, time) — reference `portfolio.js:366-373` (single-series
    * LAG) generalized to the partitioned form it uses for the market
    * leg (`portfolio.js:395-400`).
    *
    * Window shuffles on `key` only — per-key partitions sort locally.
    * At 100 TB `series` should arrive partitioned by key and sorted by
    * time (the `Stocks(symbol,timestamp)` clustered layout, SURVEY §4),
    * making the window shuffle-free.
    */
  def returns(series: DataFrame, key: String, time: String, close: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time))
    val prev = lag(col(close), 1).over(w)
    series.withColumn("ret",
      when(prev.isNotNull && prev =!= 0.0, (col(close) - prev) / prev))
  }

  /** Coefficient of variation of returns per key — reference
    * `portfolio.js:366-377`: STDDEV(r)/AVG(r) with Postgres STDDEV =
    * sample stddev (matches Spark `stddev_samp`).
    */
  def coefficientOfVariation(rets: DataFrame, key: String): DataFrame =
    rets.filter(col("ret").isNotNull)
      .groupBy(col(key))
      // try_divide: a flat series has avg return 0 — NULL, not the
      // ANSI-mode DIVIDE_BY_ZERO error (Spark 4 is ANSI by default)
      .agg(try_divide(stddev_samp(col("ret")), avg(col("ret"))).as("cov"))

  /** Equal-weighted market return per day — reference
    * `portfolio.js:402-407` (`m` CTE: AVG of all symbols' returns per
    * timestamp).
    */
  def marketReturns(rets: DataFrame, time: String): DataFrame =
    rets.filter(col("ret").isNotNull)
      .groupBy(col(time))
      .agg(avg(col("ret")).as("mret"))

  /** Beta per key vs the market: COVAR_POP(r, mr) / VAR_POP(mr) —
    * reference `portfolio.js:408-415` (J10 join + A4 aggregate).
    * The market frame is tiny (one row per day) → broadcast join.
    */
  def beta(rets: DataFrame, key: String, time: String): DataFrame = {
    val market = marketReturns(rets, time)
    rets.filter(col("ret").isNotNull)
      .join(broadcast(market), Seq(time))
      .groupBy(col(key))
      .agg(try_divide(covar_pop(col("ret"), col("mret")),
        var_pop(col("mret"))).as("beta"))
  }

  /** Pairwise correlation/covariance matrix (upper triangle) —
    * reference `portfolio.js:449-477`: returns self-joined on the day
    * with `r1.symbol <= r2.symbol` (J8), then corr/covar_pop per pair
    * (A5).
    *
    * The self-join is equi on the day; the triangle condition is a
    * post-filter, so Catalyst still plans a hash/sort-merge join, never
    * a nested loop. Cost is O(days × keys²) pairs, and on the default
    * path a whole day's key set meets itself inside ONE task — so the
    * default GUARDS the key count (`maxKeys`, one cheap distinct-count
    * probe) instead of silently detonating at 100× the reference's
    * handful of portfolio symbols.
    *
    * For large key sets pass `blocks = B > 1`: keys are hashed into B
    * blocks, one join side is replicated B ways on a block column, and
    * the join runs equi on (day, block) — each (k1, k2) pair still
    * meets exactly once (at k2's block), every aggregate is unchanged,
    * but a task now builds at most keys²∕B pairs per day and the join
    * fans out over days × B tasks. Replicating one side B× for B× the
    * parallelism and 1∕B the per-task memory is the standard blocked
    * self-join trade.
    */
  def corrMatrix(rets: DataFrame, key: String, time: String,
                 maxKeys: Int = 1000, blocks: Int = 1): DataFrame = {
    require(blocks >= 1, s"corrMatrix: blocks must be >= 1, got $blocks")
    val r = rets.filter(col("ret").isNotNull)
      .select(col(key).as("k"), col(time).as("t"), col("ret"))
    if (blocks == 1 && maxKeys > 0) {
      // EAGER pre-flight (one extra job at call time, deliberately —
      // the detonation this prevents happens inside the join, after
      // which it is too late); limit bounds the probe to maxKeys+1
      // keys. No caching: the probe must not pin state on callers
      // outside the Verify/Bench releaseAll discipline.
      val n = r.select("k").distinct().limit(maxKeys + 1).count()
      require(n <= maxKeys,
        s"corrMatrix: more than $maxKeys distinct keys — the day-keyed " +
          "self-join would build O(keys²) pairs inside single tasks; " +
          "run blockwise (blocks = ceil(keys/500)) or cap the key set")
    }
    val r1 = r.select(col("k").as("k1"), col("t"), col("ret").as("ret1"))
    val r2 = r.select(col("k").as("k2"), col("t"), col("ret").as("ret2"))
    val paired =
      if (blocks == 1) r1.join(r2, Seq("t"))
      else r1
        .withColumn("bb", explode(sequence(lit(0), lit(blocks - 1))))
        .join(r2.withColumn("bb",
          pmod(xxhash64(col("k2")), lit(blocks.toLong)).cast("int")),
          Seq("t", "bb"))
    paired
      .filter(col("k1") <= col("k2"))
      .groupBy(col("k1"), col("k2"))
      // explicit Pearson with try_divide: built-in corr() throws
      // DIVIDE_BY_ZERO under ANSI (Spark 4 default) for a constant
      // series, where PostgreSQL returns NULL (SURVEY §7.4)
      .agg(try_divide(covar_pop(col("ret1"), col("ret2")),
             stddev_pop(col("ret1")) * stddev_pop(col("ret2"))).as("correlation"),
           covar_pop(col("ret1"), col("ret2")).as("covariance"),
           count(lit(1)).as("n_days"))
  }

  /** Linear-regression forecast per key — the in-engine restatement of
    * the reference's app-side SimpleLinearRegression over the last-50
    * closes extrapolated `horizon` days (`chart.js:67-158`,
    * `portfolio.js:491-559`; trend classified by slope sign).
    *
    * x = ordinal index of the bar within the training window (as the
    * reference indexes its array), fitted with the built-in
    * `regr_slope`/`regr_intercept` aggregates; predictions are a
    * `sequence()` explode — no driver-side loop.
    *
    * @param trainN  training window (reference: 50)
    * @param horizon days ahead (reference: 30)
    * @param minRows minimum bars to fit (reference: 5)
    */
  def forecast(series: DataFrame, key: String, time: String, close: String,
               trainN: Int = 50, horizon: Int = 30, minRows: Int = 5): DataFrame = {
    val wDesc = Window.partitionBy(col(key)).orderBy(col(time).desc)
    val wAsc  = Window.partitionBy(col(key)).orderBy(col(time))
    val lastN = series
      .withColumn("__rd", row_number().over(wDesc))
      .filter(col("__rd") <= trainN)
      .withColumn("x", row_number().over(wAsc).cast("double"))
    val fit = lastN.groupBy(col(key)).agg(
        regr_slope(col(close), col("x")).as("slope"),
        regr_intercept(col(close), col("x")).as("intercept"),
        count(lit(1)).as("n"),
        max(col(time)).as("last_t"))
      .filter(col("n") >= minRows)
      .withColumn("trend",
        when(col("slope") > 0, "UP").when(col("slope") < 0, "DOWN").otherwise("FLAT"))
    fit.select(col(key), col("slope"), col("intercept"), col("n"), col("last_t"),
        col("trend"), explode(sequence(lit(1), lit(horizon))).as("step"))
      .withColumn("pred_date", date_add(col("last_t").cast("date"), col("step")))
      .withColumn("predicted", col("intercept") + col("slope") * (col("n") + col("step")))
      .drop("intercept", "last_t")
  }

  /** OHLC bar resampling — collapse a (key, time, price) series into
    * fixed calendar bars with open/high/low/close and bar row count:
    * the standard chart/downsample primitive behind the reference's
    * price-history chart (`chart.js` renders raw closes; any real
    * series UI re-bars server-side past a few thousand points).
    *
    * One hash aggregation, map-side combined: open/close are
    * `min_by`/`max_by` on the timestamp (deterministic when (key,
    * time) is unique — feed deduplicated series), high/low plain
    * min/max. No window, no sort, no shuffle beyond the one agg
    * exchange — at 100 TB this is the cheapest possible shape. */
  def ohlcBars(series: DataFrame, key: String, time: String, price: String,
               unit: String = "month"): DataFrame =
    series.groupBy(col(key), trunc(col(time), unit).as("bar"))
      .agg(min_by(col(price), col(time)).as("open"),
        max(col(price)).as("high"),
        min(col(price)).as("low"),
        max_by(col(price), col(time)).as("close"),
        count(lit(1)).as("n"))

  /** Rolling technical indicators — SMA, rolling sample volatility
    * and RSI over a (key, time, close) series: the windowed
    * generalization of the reference's point statistics
    * (`portfolio.js:366-377` computes ONE stddev/avg over the whole
    * history; a charting UI overlays the same statistics per bar over
    * a trailing window).
    *
    * Every frame shares one partitioning (key) and ordering (time):
    * a single shuffle + per-partition sort feeds all indicators, and
    * the frames are row-bounded (`smaN`/`rsiN` rows), so per-row work
    * is O(frame), never the whole partition. RSI uses the closed
    * ratio form 100·ag/(ag+al) (≡ 100 − 100/(1+ag/al)) with NULL on
    * an all-flat window (try_divide — ANSI-safe, PG-style NULL).
    * First row of each key has no prior close: gain/loss are 0 there
    * (CASE semantics — engines agree), so the RSI frame just starts
    * neutral.
    */
  def rollingIndicators(series: DataFrame, key: String, time: String,
                        close: String, smaN: Int = 20, rsiN: Int = 14): DataFrame = {
    val ord  = Window.partitionBy(col(key)).orderBy(col(time))
    val wSma = ord.rowsBetween(-(smaN - 1), 0)
    val wRsi = ord.rowsBetween(-(rsiN - 1), 0)
    val diff = col(close) - lag(col(close), 1).over(ord)
    val ag   = avg(col("__gain")).over(wRsi)
    val al   = avg(col("__loss")).over(wRsi)
    series
      .withColumn("sma", avg(col(close)).over(wSma))
      .withColumn("vol", stddev_samp(col(close)).over(wSma))
      .withColumn("n_win", count(lit(1)).over(wSma))
      .withColumn("__gain", when(diff > 0, diff).otherwise(lit(0.0)))
      .withColumn("__loss", when(diff < 0, -diff).otherwise(lit(0.0)))
      .withColumn("rsi", lit(100.0) * try_divide(ag, ag + al))
      .drop("__gain", "__loss")
  }

  /** Per-row running-peak drawdown: peak = MAX(close) so far (running
    * max over an unbounded-preceding row frame), dd = close/peak − 1.
    * The running max is exact (no FP accumulation) and the division
    * is plain IEEE 754 on raw column values, so the output is
    * bit-exact reproducible across engines. One shuffle on key; the
    * growing-frame max is a single sequential pass per partition.
    */
  def drawdown(series: DataFrame, key: String, time: String, close: String): DataFrame = {
    val wCum = Window.partitionBy(col(key)).orderBy(col(time))
      .rowsBetween(Window.unboundedPreceding, 0)
    series.withColumn("peak", max(col(close)).over(wCum))
      .withColumn("dd", col(close) / col("peak") - 1)
  }

  /** Max-drawdown summary per key: the deepest dd plus the series
    * peak and bar count — one agg over [[drawdown]]'s frame. */
  def maxDrawdown(series: DataFrame, key: String, time: String, close: String): DataFrame =
    drawdown(series, key, time, close)
      .groupBy(col(key))
      .agg(min(col("dd")).as("max_drawdown"),
        max(col(close)).as("peak_close"),
        count(lit(1)).as("n_bars"))

  /** EXPONENTIAL MOVING AVERAGE — the genuinely recursive window
    * (`ema_t = α·x_t + (1−α)·ema_{t−1}`, seeded `ema_1 = x_1`) that
    * declarative window frames cannot express: the closed form needs
    * `(1−α)^{-i}` factors that overflow double past a few thousand
    * rows, and SQL's alternative is a recursive CTE. Spark-first
    * shape: hash-repartition on the series key, sort within
    * partitions by (key, time, tiebreak), then ONE streaming pass per
    * partition with O(1) state — per-key sequentiality is inherent to
    * the recurrence; cross-key parallelism stays full. No per-key
    * group materialization (a key's series streams through the
    * iterator), no window shuffle beyond the one repartition, no
    * driver collect. At 100 TB a (key,time)-clustered layout makes
    * even the repartition a no-op.
    *
    * Determinism: the recurrence is two IEEE-double multiplies and an
    * add per row in a fixed order, so results are bit-reproducible
    * for a given sort order; pass `tiebreak` columns whenever
    * (key,time) does not uniquely order rows. NULL values emit a NULL
    * ema and leave the state untouched (the gap simply carries the
    * previous average forward, DuckDB `lag`-ignore-nulls style). */
  def ema(series: DataFrame, key: String, time: String, value: String,
          alpha: Double, tiebreak: Seq[String] = Nil): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"ema: alpha in (0,1], got $alpha")
    val in = series.withColumn("__v", col(value).cast("double"))
      .repartition(col(key))
      .sortWithinPartitions((Seq(key, time) ++ tiebreak).map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      in.schema.fields :+ org.apache.spark.sql.types.StructField(
        "ema", org.apache.spark.sql.types.DoubleType, nullable = true))
    val keyIdx = in.schema.fieldIndex(key)
    val valIdx = in.schema.fieldIndex("__v")
    val out = in.mapPartitions { it =>
      // partition = many whole keys, sorted; O(1) state per scan
      var curKey: Any = null
      var haveKey = false
      var haveEma = false
      var state = 0.0
      it.map { r =>
        val k = r.get(keyIdx)
        // deepEquals, not !=: a BINARY-typed key surfaces as
        // Array[Byte], whose == is reference equality — plain != would
        // reset the state on EVERY row and silently re-seed the series
        if (!haveKey || !java.util.Objects.deepEquals(k, curKey)) {
          curKey = k; haveKey = true; haveEma = false; state = 0.0
        }
        if (r.isNullAt(valIdx)) {
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq :+ (if (haveEma) java.lang.Double.valueOf(state) else null))
        } else {
          val x = r.getDouble(valIdx)
          state = if (haveEma) alpha * x + (1.0 - alpha) * state else x
          haveEma = true
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ state)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    out.drop("__v")
  }

  /** HOLT'S LINEAR-TREND smoothing (double exponential smoothing,
    * Holt 1957) — the forecasting step past [[ema]]'s flat level and
    * past [[forecast]]'s single global regression line:
    *
    *   level_t = α·x_t + (1−α)·(level_{t−1} + trend_{t−1})
    *   trend_t = β·(level_t − level_{t−1}) + (1−β)·trend_{t−1}
    *
    * seeded level_1 = x_1, trend_1 = 0; the h-step-ahead forecast is
    * `level + h·trend` (a projection the caller adds). Same execution
    * shape as [[ema]] — hash-repartition on the key, sorted streaming
    * scan, O(1) state (two doubles) per key, bit-reproducible for a
    * given sort order — because the recurrence is inherently
    * sequential per key and nothing else is. NULL values emit NULL
    * and leave both states untouched. Emits `level` and `trend`. */
  def holtLinear(series: DataFrame, key: String, time: String,
                 value: String, alpha: Double, beta: Double,
                 tiebreak: Seq[String] = Nil): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"holtLinear: alpha in (0,1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"holtLinear: beta in [0,1], got $beta")
    val in = series.withColumn("__v", col(value).cast("double"))
      .repartition(col(key))
      .sortWithinPartitions((Seq(key, time) ++ tiebreak).map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      in.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("level",
          org.apache.spark.sql.types.DoubleType, nullable = true),
        org.apache.spark.sql.types.StructField("trend",
          org.apache.spark.sql.types.DoubleType, nullable = true)))
    val keyIdx = in.schema.fieldIndex(key)
    val valIdx = in.schema.fieldIndex("__v")
    val out = in.mapPartitions { it =>
      var curKey: Any = null
      var haveKey = false
      var seeded = false
      var level = 0.0
      var trend = 0.0
      it.map { r =>
        val kk = r.get(keyIdx)
        // deepEquals for array-typed keys — see [[ema]]'s scan
        if (!haveKey || !java.util.Objects.deepEquals(kk, curKey)) {
          curKey = kk; haveKey = true; seeded = false
          level = 0.0; trend = 0.0
        }
        if (r.isNullAt(valIdx)) {
          val pad: Seq[Any] =
            if (seeded) Seq(level, trend) else Seq(null, null)
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ pad)
        } else {
          val x = r.getDouble(valIdx)
          if (!seeded) { level = x; trend = 0.0; seeded = true }
          else {
            val prev = level
            level = alpha * x + (1.0 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1.0 - beta) * trend
          }
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(level, trend))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    out.drop("__v")
  }

  /** Portfolio market value — Σ latest_close × shares + cash
    * (reference `portfolio.js:288-304`, an app-side JS loop over N+1
    * price queries; here one latestPerKey + one broadcast join + one
    * agg).
    */
  def portfolioValue(holdings: DataFrame, latestPrices: DataFrame,
                     pfKey: String, symbol: String,
                     shares: Column, close: Column): DataFrame =
    holdings.join(latestPrices, Seq(symbol))
      .groupBy(col(pfKey))
      .agg(sum(shares * close).as("market_value"))
}
