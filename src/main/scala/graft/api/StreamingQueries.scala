package graft.api

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.streaming.Streams

/** Streaming surface, exercised through its batch-equivalent form
  * (transformations in graft.streaming are source-agnostic; the
  * streaming execution itself is pinned by StreamsSpec with
  * MemoryStream). */
object StreamingQueries {

  val entries: Seq[Q] = Seq(
    Q("st1_windowed_agg",
      // tumbling 1-hour window agg — the watermarked streaming
      // aggregation run over the events table; hour windows align to
      // epoch, so window.start ≡ date_trunc.
      // Parity: sum in exact DECIMAL(18,2) internally (order-
      // independent), surface CAST(... AS DOUBLE) on BOTH sides — the
      // repo-wide money convention (QueryCatalog conventions block).
      // Raw DECIMAL gate columns are not hash-portable against the
      // driver (r2 regression: st1 passed r1 with this DOUBLE shape,
      // failed r2 with DECIMAL output).
      (s, dir) => Streams.windowedEventAgg(
          Tables.load(s, dir, "events"), "1 hour")
        .select(col("window_start"), col("event_type"), col("n"),
          col("total").cast("decimal(18,2)").cast("double").as("total"))
        .orderBy("window_start", "event_type"),
      Some("SELECT date_trunc('hour', ts) AS window_start, event_type, " +
        "count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM events GROUP BY 1, 2 ORDER BY window_start, event_type")),

    Q("st2_sessionize_batch",
      // batch sessionization (30-min inactivity gap): lag-gap flags +
      // running-sum session ids — the SQL-expressible twin of the
      // stateful Streams.sessionize; timestamps compared as exact
      // epoch-microsecond longs
      // Hash-robustness: every window on BOTH sides orders by the
      // identical expression (us, event_id) — never raw ts. The total
      // is summed in exact DECIMAL(18,2) (order-independent) then
      // surfaced as DOUBLE on both sides — raw DECIMAL gate columns
      // are not hash-portable against the driver (see st1).
      // session_id: DuckDB sum(int) returns HUGEINT (int128); surfaced
      // raw it was the suite's ONLY int128 output column and the reason
      // st2 hash-failed in r1-r3 (the driver's stack stringifies
      // HUGEINT unlike BIGINT; the local replica's fetchall() hides the
      // difference by converting both to Python int). CAST AS BIGINT in
      // the oracle — the Spark side is already LongType.
      (s, dir) => {
        val base = Tables.load(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val flagged = base
          .withColumn("ns",
            when(lag(col("us"), 1).over(w).isNull ||
              col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L, 1)
              .otherwise(0))
          .withColumn("session_id",
            sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        flagged.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("total"),
            min(col("us")).as("start_us"), max(col("us")).as("end_us"))
          .orderBy("user_id", "session_id")
      },
      Some("WITH f AS (SELECT user_id, event_id, value, epoch_us(ts) AS us, " +
        "CASE WHEN lag(epoch_us(ts)) OVER w IS NULL OR epoch_us(ts) - " +
        "lag(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS ns " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)), " +
        "s AS (SELECT user_id, value, us, CAST(sum(ns) OVER (PARTITION BY user_id " +
        "ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS session_id FROM f) " +
        "SELECT user_id, session_id, count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, " +
        "min(us) AS start_us, max(us) AS end_us " +
        "FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id")),

    Q("st3_interval_join",
      // the watermarked stream-stream interval join
      // (Streams.quotedTrades), batch twin: each purchase event joined
      // to the same user's view events in the prior 2 hours.
      // Timestamps compared and emitted as exact epoch-µs longs;
      // values pass through unaggregated (hash-exact doubles).
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val trades = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").cast("string").as("symbol"),
            col("ts").as("tts"), col("value").as("qty"))
        val quotes = ev.filter(col("event_type") === "view")
          .select(col("user_id").cast("string").as("symbol"),
            col("ts").as("qts"), col("value").as("price"))
        Streams.quotedTrades(trades, quotes, lookback = "2 hours")
          .select(col("symbol").cast("long").as("user_id"),
            unix_micros(col("tts")).as("t_us"), col("qty"),
            unix_micros(col("qts")).as("q_us"), col("price"))
          // ORDER BY every output column = total order (parity rule:
          // same-(user, ts) same-type event pairs would otherwise tie)
          .orderBy("user_id", "t_us", "qty", "q_us", "price")
      },
      Some("SELECT t.user_id, epoch_us(t.ts) AS t_us, t.value AS qty, " +
        "epoch_us(q.ts) AS q_us, q.value AS price " +
        "FROM events t JOIN events q ON t.user_id = q.user_id " +
        "AND q.ts <= t.ts AND q.ts >= t.ts - INTERVAL 2 HOURS " +
        "WHERE t.event_type = 'purchase' AND q.event_type = 'view' " +
        "ORDER BY 1, 2, 3, 4, 5")),
  )
}
