package graft.api

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
      // tumbling 1-hour window agg with exact DECIMAL sums — the
      // watermarked streaming aggregation run over the events table;
      // hour windows align to epoch, so window.start ≡ date_trunc
      (s, dir) => Streams.windowedEventAgg(
          Tables.load(s, dir, "events"), "1 hour")
        .select(col("window_start"), col("event_type"), col("n"),
          col("total").cast("double").as("total"))
        .orderBy("window_start", "event_type"),
      Some("SELECT date_trunc('hour', ts) AS window_start, event_type, " +
        "count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM events GROUP BY 1, 2 ORDER BY window_start, event_type")),
  )
}
