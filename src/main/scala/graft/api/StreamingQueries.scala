package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.catalog.Tables
import graft.streaming.Streams

/** Streaming surface, exercised through its batch-equivalent form
  * (transformations in graft.streaming are source-agnostic; the
  * streaming execution itself is pinned by StreamsSpec with
  * MemoryStream). */
object StreamingQueries {

  /** Size the STATEFUL shuffle for a toy-volume stream before start:
    * a streaming query snapshots `spark.sql.shuffle.partitions` when
    * it starts, and every stateful operator then commits one state
    * store per partition per micro-batch — at gate scale (thousands
    * of keys) 32 stores are pure commit overhead. 8 keeps the
    * operators identical and the commit machinery proportional; a
    * production stream sizes this to its key volume (the knob IS the
    * tuning surface). Applied only to the PURE-STATE streams
    * (dedup/fold/enrich); the write-heavy sinks (scd2, ingest) keep
    * the session default — their per-epoch Layout writes want the
    * I/O parallelism. Restored immediately after start so batch
    * queries in the same session are untouched — NOT a race:
    * StreamExecution clones the session (snapshotting the conf)
    * during query construction inside start(), verified empirically
    * by graft.StatePartitionsCheck (state ran at 8 partitions with
    * the session conf already restored to 4). */
  private def startWithStatePartitions[T](s: SparkSession, n: Int)
                                         (start: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try start finally s.conf.set(key, old)
  }

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

    Q("st11_outer_join",
      // LEFT OUTER stream-stream interval join (Streams.
      // quotedTradesOuter), batch twin: every purchase emits even
      // with NO view in the prior 2 hours — null-padded quote columns
      // — the "which conversions had no touchpoint" question an inner
      // join silently drops. Streaming null-emission at the watermark
      // is pinned by StreamsSpec; this gates the batch-equivalent
      // semantics under the oracle (row order is irrelevant to the
      // driver's hash — it sorts serialized rows).
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val trades = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").cast("string").as("symbol"),
            col("ts").as("tts"), col("value").as("qty"))
        val quotes = ev.filter(col("event_type") === "view")
          .select(col("user_id").cast("string").as("symbol"),
            col("ts").as("qts"), col("value").as("price"))
        Streams.quotedTradesOuter(trades, quotes, lookback = "2 hours")
          .select(col("symbol").cast("long").as("user_id"),
            unix_micros(col("tts")).as("t_us"), col("qty"),
            unix_micros(col("qts")).as("q_us"), col("price"))
          .orderBy("user_id", "t_us", "qty", "q_us", "price")
      },
      Some("SELECT t.user_id, epoch_us(t.ts) AS t_us, t.value AS qty, " +
        "epoch_us(q.ts) AS q_us, q.value AS price " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') t " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') q " +
        "ON t.user_id = q.user_id " +
        "AND q.ts <= t.ts AND q.ts >= t.ts - INTERVAL 2 HOURS " +
        "ORDER BY 1, 2, 3, 4, 5")),

    Q("st14_full_outer_join",
      // FULL OUTER stream-stream interval join (Streams.
      // quotedTradesFull), batch twin: every purchase emits (null
      // views) AND every view no purchase looked back at emits (null
      // purchase columns) — the symmetric completion of st11's LEFT
      // outer, and the last stream-join variant a pipeline hits
      // (audit "which touchpoints never converted" in the same pass
      // as "which conversions had no touchpoint"). Streaming
      // both-side null-emission at watermark close is pinned by
      // StreamsSpec; this gates the batch-equivalent semantics under
      // the oracle. user_id surfaces from whichever side exists.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val trades = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").cast("string").as("symbol"),
            col("ts").as("tts"), col("value").as("qty"))
        val quotes = ev.filter(col("event_type") === "view")
          .select(col("user_id").cast("string").as("symbol"),
            col("ts").as("qts"), col("value").as("price"))
        Streams.quotedTradesFull(trades, quotes, lookback = "2 hours")
          .select(col("symbol").cast("long").as("user_id"),
            unix_micros(col("tts")).as("t_us"), col("qty"),
            unix_micros(col("qts")).as("q_us"), col("price"))
          .orderBy("user_id", "t_us", "qty", "q_us", "price")
      },
      Some("SELECT coalesce(t.user_id, q.user_id) AS user_id, " +
        "epoch_us(t.ts) AS t_us, t.value AS qty, " +
        "epoch_us(q.ts) AS q_us, q.value AS price " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') t " +
        "FULL JOIN (SELECT * FROM events WHERE event_type = 'view') q " +
        "ON t.user_id = q.user_id " +
        "AND q.ts <= t.ts AND q.ts >= t.ts - INTERVAL 2 HOURS " +
        "ORDER BY 1, 2, 3, 4, 5")),

    Q("st4_scd2_stream",
      // the STREAMING twin of u11_scd2, through the real sink: the
      // orders changelog arrives as three time-ordered micro-batches,
      // each merged into the persisted history by Streams.scd2Sink
      // (snapshot + atomic pointer flip), and the read-back equals
      // historize over the full log — Scd.merge's append-style
      // exactness contract made a driver-gated fact, not just a spec.
      // Batch boundaries are GLOBAL ts thresholds, so same-ts rows
      // never straddle a boundary and every batch is append-style per
      // key by construction. The changelog is key-bounded (custkey ≤
      // 300, ~3k rows at any SF) because MemoryStream feeds from the
      // driver — the bound is the test harness's, not the sink's; the
      // sink itself merges distributed frames (u11 pins the same merge
      // at full scale).
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // per-run nonce (applicationId): two concurrent drivers over the
        // same sfDir must not share a sink root — each would delete and
        // flip the other's bucket dirs mid-stream
        val root = System.getProperty("java.io.tmpdir") +
          "/graft_scd2sink_" + s.sparkContext.applicationId +
          "_" + Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val log = Tables.load(s, dir, "orders")
          .filter(col("o_custkey") <= 300)
          .select(col("o_custkey").as("custkey"),
            col("o_orderdate").cast("date").as("ts"),
            col("o_orderkey").as("ord"),
            col("o_orderstatus").as("status"),
            col("o_orderpriority").as("prio"))
          .as[(Long, java.sql.Date, Long, String, String)]
          .collect()
        val cut1 = java.sql.Date.valueOf("1994-01-01")
        val cut2 = java.sql.Date.valueOf("1996-06-01")
        val batches = Seq(
          log.filter(_._2.before(cut1)),
          log.filter(r => !r._2.before(cut1) && r._2.before(cut2)),
          log.filter(r => !r._2.before(cut2)))
        val mem = MemoryStream[(Long, java.sql.Date, Long, String, String)]
        val sink = Streams.scd2Sink(
          mem.toDF().toDF("custkey", "ts", "ord", "status", "prio"),
          root, Seq("custkey"), "ts", "ord", Seq("status", "prio"),
          checkpointLocation = Some(root + "/_checkpoint"))
        try batches.foreach { b =>
          mem.addData(b.toIndexedSeq); sink.processAllAvailable()
        } finally sink.stop()
        Streams.scd2History(s, root)
          .select(col("custkey"), col("status"), col("prio"),
            col("valid_from"), col("valid_to"), col("is_current"))
          .orderBy(col("custkey"), col("valid_from"), col("status"),
            col("prio"), col("valid_to"))
      },
      Some("WITH log AS (SELECT o_custkey AS custkey, " +
        "CAST(o_orderdate AS DATE) AS ts, o_orderkey AS ord, " +
        "o_orderstatus AS status, o_orderpriority AS prio FROM orders " +
        "WHERE o_custkey <= 300), " +
        "m AS (SELECT *, (lag(status) OVER w IS NOT DISTINCT FROM status) " +
        "AND (lag(prio) OVER w IS NOT DISTINCT FROM prio) AS same, " +
        "lag(ts) OVER w IS NULL AS fst FROM log " +
        "WINDOW w AS (PARTITION BY custkey ORDER BY ts, ord)), " +
        "v AS (SELECT custkey, status, prio, ts AS valid_from, " +
        "lead(ts) OVER (PARTITION BY custkey ORDER BY ts, ord) AS valid_to " +
        "FROM m WHERE fst OR NOT same) " +
        "SELECT custkey, status, prio, valid_from, valid_to, " +
        "valid_to IS NULL AS is_current FROM v " +
        "ORDER BY custkey, valid_from, status, prio, valid_to")),

    Q("st5_stream_dedup",
      // the STREAMING twin of d1_exact_dedup, through real streaming
      // execution: the corpus arrives as three micro-batches (original
      // docs by id range, then each range's shifted-id copies one
      // batch LATER), deduplicated by Streams.dedupStream
      // (dropDuplicatesWithinWatermark on the content fingerprint).
      // First-arrival-wins ≡ min doc_id here because every duplicate
      // pair spans a batch boundary and batches arrive in id order;
      // within one batch all fingerprints are distinct (the documents
      // generator's texts are unique — d1 pins that fact: survivors ==
      // originals). The watermark horizon (3650 days) exceeds the
      // synthetic ts spread, so no state is evicted mid-run — eviction
      // itself is pinned by StreamsSpec. Like st4, the driver-side
      // collect is the MemoryStream harness's, not the operator's.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .as[(Long, String)].collect().sortBy(_._1)
        val maxId = docs.last._1
        val c1 = maxId / 3
        val c2 = 2 * maxId / 3
        def cp(b: Array[(Long, String)]) = b.map { case (i, x) => (i + 10000000L, x) }
        val o1 = docs.filter(_._1 <= c1)
        val o2 = docs.filter(d => d._1 > c1 && d._1 <= c2)
        val o3 = docs.filter(_._1 > c2)
        val batches = Seq(o1, o2 ++ cp(o1), o3 ++ cp(o2))
        val mem = MemoryStream[(Long, String)]
        val deduped = Streams.dedupStream(
          mem.toDF().toDF("doc_id", "text")
            .withColumn("ts", timestamp_seconds(
              lit(1704067200L) + pmod(col("doc_id"), lit(10000000L)))),
          "ts", "text", watermark = "3650 days")
        val sinkName = "st5_dedup_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = startWithStatePartitions(s, 8)(
          deduped.writeStream.format("memory").queryName(sinkName)
            .outputMode("append").start())
        try batches.foreach { b =>
          mem.addData(b.toIndexedSeq); q.processAllAvailable()
        } finally q.stop()
        s.table(sinkName).select(col("doc_id")).orderBy("doc_id")
      },
      Some("SELECT min(doc_id) AS doc_id FROM (" +
        "SELECT doc_id, text FROM documents UNION ALL " +
        "SELECT doc_id + 10000000, text FROM documents " +
        "WHERE doc_id <= (SELECT 2 * max(doc_id) // 3 FROM documents)) " +
        s"GROUP BY md5(${PipelineQueries.normSql}) ORDER BY doc_id")),

    Q("st6_stream_holdings",
      // the avg-cost holdings fold through REAL streaming execution
      // (Streams.holdingsStream, flatMapGroupsWithState) — u6/u9's
      // third execution path against the SAME oracle: the demo trade
      // log arrives as three time-ordered micro-batches; per key the
      // latest update (max n_trades version stamp) must equal the
      // batch replay. avg_cost is reported from the shared closed-form
      // DECIMAL quotient exactly as u6 does (the fold's sequential
      // float recurrence is pinned by TradingSpec/StreamsSpec). Like
      // st4/st5, the driver-side collect is the MemoryStream
      // harness's, not the operator's.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val (trades, closedAvg) = DomainQueries.demoTrades(s, dir)
        val log = trades.as[Streams.StreamTrade].collect()
          .sortBy(t => (t.ts, t.seq))
        val batches = log.grouped(math.max(1, (log.length + 2) / 3)).toSeq
        val mem = MemoryStream[Streams.StreamTrade]
        val sinkName = "st6_hold_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = startWithStatePartitions(s, 8)(
          Streams.holdingsStream(mem.toDS()).writeStream
            .format("memory").queryName(sinkName).outputMode("append").start())
        try batches.foreach { b =>
          mem.addData(b.toIndexedSeq); q.processAllAvailable()
        } finally q.stop()
        graft.ops.Kernels.latestPerKey(s.table(sinkName),
            Seq("portfolio", "symbol"), Seq(col("n_trades")))
          .drop("avg_cost", "n_trades")
          .join(closedAvg, Seq("portfolio", "symbol"))
          .select(col("portfolio"), col("symbol"), col("shares"),
            col("avg_cost"), col("n_rejected"))
          .orderBy("portfolio", "symbol")
      },
      Some(DomainQueries.holdFoldOracle)),

    Q("st7_stream_enrich",
      // stream–static enrichment through REAL streaming execution:
      // the event log arrives as three micro-batches, each LEFT-joined
      // against the broadcast customer dimension (Streams.enrichStream
      // — stateless, append-exact); the enriched sink is then rolled
      // up per market segment. The oracle is the same LEFT join done
      // batch-wise. Money sums exact DECIMAL→DOUBLE (st1 convention).
      // Like st4–st6, the driver-side collect is the MemoryStream
      // harness's, not the operator's.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"))
          .as[(Long, Long, Double)].collect().sortBy(_._1)
        val dim = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        val batches = ev.grouped(math.max(1, (ev.length + 2) / 3)).toSeq
        val mem = MemoryStream[(Long, Long, Double)]
        val enriched = Streams.enrichStream(
          mem.toDF().toDF("event_id", "user_id", "value"), dim, "user_id")
        val sinkName = "st7_enrich_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = startWithStatePartitions(s, 8)(
          enriched.writeStream.format("memory").queryName(sinkName)
            .outputMode("append").start())
        try batches.foreach { b =>
          mem.addData(b.toIndexedSeq); q.processAllAvailable()
        } finally q.stop()
        s.table(sinkName)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("total"))
          .orderBy("c_mktsegment")
      },
      Some("SELECT c_mktsegment, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey " +
        "GROUP BY 1 ORDER BY 1")),

    Q("st8_stream_ingest",
      // streaming ingest into the crash-atomic Layout: the event log
      // arrives as three micro-batches through Streams.ingestSink —
      // each epoch an O(batch) appendClusteredZoned with an
      // epoch-tagged manifest part (exactly-once via the snapshot
      // itself) — then the BATCH reader aggregates the table. The
      // oracle is the same aggregate over the source: ingest must be
      // lossless and duplicate-free across epochs. Money sums exact
      // DECIMAL→DOUBLE. The driver-side collect is the MemoryStream
      // harness's, not the operator's.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_st8_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          .as[(Long, java.sql.Timestamp, String, Double)]
          .collect().sortBy(_._1)
        val batches = ev.grouped(math.max(1, (ev.length + 2) / 3)).toSeq
        val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
        val q = Streams.ingestSink(
          mem.toDF().toDF("event_id", "ts", "event_type", "value"),
          path, symbol = "event_type", time = "ts", nBuckets = 4,
          filesPerBucket = 2)
        try batches.foreach { b =>
          mem.addData(b.toIndexedSeq); q.processAllAvailable()
        } finally q.stop()
        graft.catalog.Layout.read(s, path, "event_type", "ts", numBuckets = 4)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, count(*) AS n, min(event_id) AS min_id, " +
        "max(event_id) AS max_id, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM events GROUP BY 1 ORDER BY 1")),

    Q("st9_stream_view",
      // continuously-maintained view over a CDC stream
      // (Streams.viewSink): epoch 1 inserts a quarter slice of orders,
      // epoch 2 retracts the %7 keys — each epoch one signed
      // batch-sized fold into the copy-on-write state snapshot
      // (exactly-once via the epoch-named pointer). The final state
      // must equal recomputing over the net rows (the oracle); fold
      // algebra is pinned by IncrementalAggSpec, epoch/GC/replay
      // mechanics by StreamsSpec. Money sums exact DECIMAL→DOUBLE; the
      // driver-side collect is the MemoryStream harness's, not the
      // operator's.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val root = System.getProperty("java.io.tmpdir") +
          "/graft_st9_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val rows = Tables.load(s, dir, "orders")
          .filter(pmod(col("o_orderkey"), lit(4)) === 0)
          .select(col("o_orderstatus"), col("o_totalprice"),
            col("o_orderkey"))
          .as[(String, Double, Long)].collect()
        val inserts = rows.map { case (k, v, _) => (k, v, "insert") }
        val deletes = rows.filter(_._3 % 7 == 0)
          .map { case (k, v, _) => (k, v, "delete") }
        val mem = MemoryStream[(String, Double, String)]
        val q = Streams.viewSink(
          mem.toDF().toDF("symbol", "qty", "_change_type"), root,
          Seq("symbol"), Seq("qty"))
        try {
          mem.addData(inserts.toIndexedSeq); q.processAllAvailable()
          mem.addData(deletes.toIndexedSeq); q.processAllAvailable()
        } finally q.stop()
        Streams.viewState(s, root).get
          .select(col("symbol"), col("__cnt").as("n"),
            col("sum_qty").cast("double").as("sum_qty"))
          .orderBy("symbol")
      },
      Some("SELECT o_orderstatus AS symbol, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 7 <> 0 " +
        "GROUP BY 1 ORDER BY 1")),

    Q("st10_stream_mv",
      // streaming MV maintenance (Streams.mvRefreshSink): the summary
      // starts EMPTY, two micro-batches of orders fold in via
      // refreshAppend (O(batch+MV) per epoch, copy-on-write), then an
      // aggregate over the FULL base table must be answered from the
      // streamed summary alone (plan-asserted — the fact is never
      // scanned). Epoch replay/high-water mechanics are StreamsSpec's;
      // money sums exact DECIMAL→DOUBLE.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val root = System.getProperty("java.io.tmpdir") +
          "/graft_st10_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val name = "st10_" + Integer.toHexString(root.hashCode)
        val factPath = root + "/fact"
        if (graft.plans.MvCatalog.get(name).isEmpty) {
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(root), true)
          Tables.load(s, dir, "orders").select(
            col("o_orderstatus").as("status"),
            col("o_orderpriority").as("prio"),
            col("o_orderkey").as("ok"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(factPath)
          val full = s.read.parquet(factPath)
          graft.plans.Mv.build(full.limit(0), name, Seq("status", "prio"),
            measures = Seq("price"), mvPath = root + "/mv")
          val rows = full.select(col("status"), col("prio"), col("ok"),
            col("price").cast("double"))
            .as[(String, String, Long, Double)].collect()
          val (first, second) = rows.partition(_._3 % 2 == 0)
          val mem = MemoryStream[(String, String, Long, Double)]
          val q = graft.streaming.Streams.mvRefreshSink(
            mem.toDF().toDF("status", "prio", "ok", "price")
              .select(col("status"), col("prio"),
                col("price").cast("decimal(18,2)").as("price")), name)
          try {
            mem.addData(first.toIndexedSeq); q.processAllAvailable()
            mem.addData(second.toIndexedSeq); q.processAllAvailable()
          } finally q.stop()
        }
        graft.plans.Mv.install(s)
        MvQueries.assertMvScan(s.read.parquet(factPath)
          .groupBy("status").agg(
            count(lit(1)).as("n"),
            sum("price").cast("double").as("total")).orderBy("status"))
      },
      Some("SELECT o_orderstatus AS status, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM orders GROUP BY 1 ORDER BY 1")),

    Q("st13_stream_star_mv",
      // STREAMING STAR-MV MAINTENANCE over a SNAPSHOT-LOGGED fact
      // (Streams.mvLogRefreshSink): the star summary is built over
      // orders ⋈ customer while the fact holds only the even order
      // keys; the odd half then STREAMS in across two micro-batches —
      // each epoch ingests exactly-once into the Layout fact (the
      // _e<epoch> manifest tag is the committed offset) and the
      // summary heals itself from the snapshot log (refreshFromLog:
      // Δ-probe-sided fact-window fold, O(batch+MV)). Durable where
      // st10's refreshAppend sink is session-scoped: the log is the
      // source of truth, so replays skip and missed refreshes heal on
      // the next epoch. The final 3-way-written base query must be
      // answered from the streamed summary alone (plan-asserted) and
      // match the from-scratch join over ALL orders.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val root = System.getProperty("java.io.tmpdir") + "/graft_st13_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "st13_" + Integer.toHexString(root.hashCode)
        val factP = root + "/sfact"
        val dimP = root + "/sdim"
        if (graft.plans.MvCatalog.get(name).isEmpty) {
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(root), true)
          val o = Tables.load(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"),
            col("o_orderkey").as("ok"))
          graft.catalog.Layout.writeClusteredZoned(
            o.filter(col("ok") % 2 === 0), factP,
            "status", "ok", numBuckets = 4, filesPerBucket = 4)
          graft.catalog.Layout.writeClusteredZoned(
            Tables.load(s, dir, "customer").select(
              col("c_custkey").as("ck2"), col("c_mktsegment").as("seg")),
            dimP, "seg", "ck2", numBuckets = 4, filesPerBucket = 2)
          graft.plans.Mv.buildJoin(
            s.read.parquet(factP).select("ck", "status", "price"),
            s.read.parquet(dimP).select("ck2", "seg"),
            name, on = Seq("ck" -> "ck2"),
            dims = Seq("seg", "status"), measures = Seq("price"),
            mvPath = root + "/mv")
          // the odd half streams in across two epochs
          val rows = o.filter(col("ok") % 2 === 1)
            .select(col("ck"), col("status"),
              col("price").cast("double"), col("ok"))
            .as[(Long, String, Double, Long)].collect()
          val (e1, e2) = rows.partition(_._4 % 4 == 1L)
          val mem = MemoryStream[(Long, String, Double, Long)]
          val q = graft.streaming.Streams.mvLogRefreshSink(
            mem.toDF().toDF("ck", "status", "price", "ok")
              .select(col("ck"), col("status"),
                col("price").cast("decimal(18,2)").as("price"), col("ok")),
            factP, symbol = "status", time = "ok", mvName = name,
            nBuckets = 4, filesPerBucket = 4,
            checkpointLocation = Some(root + "/_checkpoint"))
          try {
            mem.addData(e1.toIndexedSeq); q.processAllAvailable()
            mem.addData(e2.toIndexedSeq); q.processAllAvailable()
          } finally q.stop()
        }
        graft.plans.Mv.install(s)
        MvQueries.assertMvScan(s.read.parquet(factP)
          .join(s.read.parquet(dimP), col("ck") === col("ck2"), "inner")
          .groupBy("seg").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("seg"))
      },
      Some("WITH sfact AS (SELECT o_custkey AS ck, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders), " +
        "sdim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT seg, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM sfact JOIN sdim ON ck = ck2 GROUP BY seg ORDER BY seg")),

    Q("st12_stream_corpus_dedup",
      // STREAMING CORPUS-DEDUP INGEST (Streams.corpusDedupSink over a
      // persisted LshIndex): batch 1 streams the whole documents
      // table into an EMPTY corpus — in-batch set-equality dedup
      // keeps the min id per equal-shingle-set group; batch 2 streams
      // id-shifted copies of the even docs (cross-batch duplicates of
      // already-admitted content — dropped by the O(batch) index
      // probe) plus 20 synthetic novel docs (admitted). SHORT docs
      // (< 3 tokens, no shingles) have no signature and are admitted
      // every time by design — the oracle mirrors all three lanes.
      // The admitted parquet read back IS the gate output, so the
      // probe, the in-batch dedup, the index append, and the
      // cross-batch durability are all under the oracle hash.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val root = System.getProperty("java.io.tmpdir") + "/graft_st12_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val idx = root + "/idx"
        val outP = root + "/admitted"
        if (graft.catalog.SnapshotManifest.currentSnap(s, idx).isEmpty) {
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(root), true)
          val d = Tables.load(s, dir, "documents").select("doc_id", "text")
          graft.pipeline.LshIndex.build(d.limit(0), idx, "doc_id", "text",
            n = 3, k = 32, bands = 16)
          val originals = d.as[(Long, String)].collect()
          val copies = originals.filter(_._1 % 2 == 0)
            .map { case (i, t0) => (i + 10000000L, t0) }
          val synth = (0 until 20).map(i =>
            (30000000L + i, s"zzsyn$i aazz$i qqxx$i wwvv$i ppoo$i"))
          val mem = MemoryStream[(Long, String)]
          val q = Streams.corpusDedupSink(
            mem.toDF().toDF("doc_id", "text"), idx, outP,
            checkpointLocation = Some(root + "/_checkpoint"))
          try {
            mem.addData(originals.toIndexedSeq); q.processAllAvailable()
            mem.addData(copies.toIndexedSeq ++ synth); q.processAllAvailable()
          } finally q.stop()
        }
        s.read.parquet(outP).select(col("doc_id")).orderBy("doc_id")
      },
      Some("WITH toks AS (SELECT doc_id, " +
        s"regexp_split_to_array(${PipelineQueries.normSql}, '\\s+') AS w " +
        "FROM documents), " +
        "pos AS (SELECT doc_id, w, unnest(CASE WHEN len(w) >= 3 THEN " +
        "generate_series(1, len(w) - 2) ELSE [] END) AS i FROM toks), " +
        "sh AS (SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS g FROM pos), " +
        "fp AS (SELECT doc_id, bit_xor(hash(g)) AS f FROM sh GROUP BY doc_id), " +
        "surv AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f), " +
        "short AS (SELECT doc_id FROM toks WHERE len(w) < 3), " +
        "admitted AS (SELECT doc_id FROM surv " +
        "UNION ALL SELECT doc_id FROM short " +
        "UNION ALL SELECT doc_id + 10000000 FROM short WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT 30000000 + generate_series FROM generate_series(0, 19)) " +
        "SELECT doc_id FROM admitted ORDER BY doc_id")),

    Q("st15_stream_media_dedup",
      // STREAMING MEDIA near-dup at ingest — st5's multimodal twin
      // and mm7's streaming twin, through real streaming execution:
      // batch 1 delivers each group's 8 kHz master WAV (even ids),
      // batch 2 the 16 kHz RESAMPLED re-encode of the same clip (odd
      // ids) plus two undecodable payloads. The perceptual
      // fingerprint is bit-identical across the two rates (mm7's
      // exact-integer construction), so dropDuplicatesWithinWatermark
      // on the fingerprint drops every batch-2 copy while both
      // broken rows PASS THROUGH (dedup may only drop what it can
      // prove duplicate). Survivors = all even ids + the two
      // undecodables — enumerated arithmetically by the oracle. Like
      // st5, the driver-side collect is the MemoryStream harness's,
      // not the operator's.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val ids = Tables.load(s, dir, "documents")
          .filter(col("doc_id") < 300)
          .select(col("doc_id")).as[Long].collect().sorted
        def wav(id: Long): Array[Byte] =
          graft.pipeline.Multimodal.stepWavAt(id / 2, highRate = id % 2 == 1)
        val masters = ids.filter(_ % 2 == 0).map(id =>
          (id, "audio/wav", wav(id)))
        val copies = ids.filter(_ % 2 == 1).map(id =>
          (id, "audio/wav", wav(id))) ++
          Seq((9000001L, "audio/wav", Array[Byte](1, 2, 3)),
            (9000002L, "audio/wav", Array[Byte](4, 5)))
        val mem = MemoryStream[(Long, String, Array[Byte])]
        val deduped = Streams.mediaDedupStream(
          mem.toDF().toDF("media_id", "media_type", "payload")
            .withColumn("ts", timestamp_seconds(
              lit(1704067200L) + pmod(col("media_id"), lit(1000000L)))),
          "ts", watermark = "3650 days")
        val sinkName = "st15_mediadedup_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = startWithStatePartitions(s, 8)(
          deduped.writeStream.format("memory").queryName(sinkName)
            .outputMode("append").start())
        try Seq(masters, copies).foreach { b =>
          mem.addData(b.toIndexedSeq); q.processAllAvailable()
        } finally q.stop()
        s.table(sinkName).select(col("media_id")).orderBy("media_id")
      },
      Some("SELECT doc_id AS media_id FROM documents " +
        "WHERE doc_id < 300 AND doc_id % 2 = 0 " +
        "UNION ALL SELECT 9000001 UNION ALL SELECT 9000002 " +
        "ORDER BY media_id")),
  )
}
