package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.catalog.Tables
import graft.ops.Kernels
import graft.domain.{Acl, Ledger, Social, Trade, Trading}
import graft.streaming.Streams

/** Batch 2: write/upsert semantics, domain flows (trading fold, ACL,
  * friend-graph state machine), set ops, scalar surface — SURVEY §2
  * rows S2/S4-S6, P5, J2/J7/J12, A7/A8, O5, U3/U5-U8, M2/M3/M5, §2.7,
  * §2.8. Same oracle-parity conventions as QueryCatalog.
  */
object DomainQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic demo trade stream derived from events (first trade
    * per (user, type) key is a large opening buy; the last two, when
    * the key has ≥5 events, are unit sells — sells never reject,
    * positions never close, so the guarded fold is SQL-expressible),
    * plus the closed-form exact-DECIMAL avg-cost: the fold's iterated
    * recurrence drifts ~1e-6 from any single-division formulation,
    * which no rounding grid survives at 7500 output rows, so gate
    * queries report the closed-form avg and the recurrence's own avg
    * stays pinned by TradingSpec. Shared by u6 (Dataset fold path)
    * and u9 (hold_fold SQL-surface path). */
  private[api] def demoTrades(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val ev = t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("event_type"))))
      .withColumn("side",
        when(col("cnt") >= 5 && col("rn") > col("cnt") - 2, "SELL")
          .otherwise("BUY"))
      .withColumn("qty",
        when(col("side") === "SELL", 1.0)
          .when(col("rn") === 1, 1000.0)
          .otherwise((lit(10) + pmod(col("event_id"), lit(7))).cast("double")))
    val trades = ev.select(
      col("user_id").as("portfolio"), col("event_type").as("symbol"),
      unix_micros(col("ts")).as("ts"), col("event_id").as("seq"),
      col("side"), col("qty"),
      col("value").cast("decimal(12,2)").cast("double").as("price"))
    val closedAvg = trades.filter(col("side") === "BUY")
      .groupBy(col("portfolio"), col("symbol"))
      .agg((sum(col("qty").cast("decimal(10,1)") *
            col("price").cast("decimal(12,2)")).cast("double") /
          sum(col("qty"))).as("avg_cost"))
    (trades, closedAvg)
  }

  /** Oracle for the demoTrades fold output — shared by u6 and u9
    * (identical semantics through two execution paths). */
  private[api] val holdFoldOracle =
    "WITH tr AS (SELECT user_id AS portfolio, event_type AS symbol, " +
      "event_id, CAST(value AS DECIMAL(12,2)) AS price, " +
      "row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn, " +
      "count(*) OVER (PARTITION BY user_id, event_type) AS cnt FROM events), " +
      "tr2 AS (SELECT *, CASE WHEN cnt >= 5 AND rn > cnt - 2 THEN 'SELL' ELSE 'BUY' END AS side, " +
      "CASE WHEN cnt >= 5 AND rn > cnt - 2 THEN 1.0 WHEN rn = 1 THEN 1000.0 " +
      "ELSE CAST(10 + event_id % 7 AS DOUBLE) END AS qty FROM tr) " +
      "SELECT portfolio, symbol, " +
      "sum(CASE WHEN side = 'BUY' THEN qty ELSE -qty END) AS shares, " +
      "CAST(sum(CASE WHEN side = 'BUY' THEN CAST(qty AS DECIMAL(10,1)) * price END) " +
      "AS DOUBLE) / sum(CASE WHEN side = 'BUY' THEN qty END) AS avg_cost, " +
      "CAST(0 AS BIGINT) AS n_rejected " +
      "FROM tr2 GROUP BY portfolio, symbol ORDER BY portfolio, symbol"

  val entries: Seq[Q] = Seq(

    Q("s2_csv_roundtrip",
      // CSV ingest path (SURVEY S2: the reference's implied
      // SP500History.csv load) — write parquet → csv, read back with
      // an explicit schema, aggregate to prove type fidelity
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_csv_" + s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        o.write.mode("overwrite").option("header", "true").csv(path)
        s.read.schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
          .option("header", "true").csv(path)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    Q("s12_json_roundtrip",
      // line-delimited JSON ingest path (s2's twin for the second
      // ubiquitous interchange format): write JSONL → read back with
      // an EXPLICIT schema (never inferred — inference is a full
      // extra pass at scale), aggregate to prove type fidelity.
      // Doubles survive exactly: Spark writes shortest-roundtrip
      // decimal forms.
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_json_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        c.write.mode("overwrite").json(path)
        s.read.schema("c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE")
          .json(path)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
          .orderBy("c_mktsegment")
      },
      Some("SELECT c_mktsegment, count(*) AS n, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal " +
        "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment")),

    Q("s4_cow_update",
      // point/predicate UPDATE as copy-on-write (stocks.js:163-169)
      (s, dir) => Kernels.cowUpdate(t(s, dir, "part"),
          col("p_brand") === "Brand#13",
          Map("p_retailprice" -> round(col("p_retailprice") * 1.1, 2)))
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .orderBy("p_partkey"),
      Some("SELECT p_partkey, p_brand, CASE WHEN p_brand = 'Brand#13' " +
        "THEN round(p_retailprice * 1.1, 2) ELSE p_retailprice END AS p_retailprice " +
        "FROM part ORDER BY p_partkey")),

    Q("s5_cow_delete",
      // point DELETE as anti-join (stocks.js:187-189)
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val doomed = li.filter(col("l_suppkey") === 3 &&
            to_date(col("l_shipdate")) < "1995-01-01")
          .select(col("l_orderkey"), col("l_linenumber"))
        Kernels.cowDelete(li, doomed, Seq("l_orderkey", "l_linenumber"))
          .filter(col("l_suppkey") === 3)
          .select(col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_day"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day " +
        "FROM lineitem WHERE l_suppkey = 3 " +
        "AND NOT (CAST(l_shipdate AS DATE) < DATE '1995-01-01') " +
        "ORDER BY l_orderkey, l_linenumber")),

    Q("s6_insert_if_absent",
      // ON CONFLICT DO NOTHING dimension upkeep (stocks.js:137-142)
      (s, dir) => {
        import s.implicits._
        val target = t(s, dir, "part").select(col("p_brand").as("brand")).distinct()
        val src = t(s, dir, "part").filter(col("p_size") > 25)
          .select(col("p_brand").as("brand")).distinct()
          .union(Seq("ZBrand#XX").toDF("brand"))
        Kernels.insertIfAbsent(target, src, Seq("brand")).orderBy("brand")
      },
      Some("SELECT DISTINCT brand FROM (SELECT p_brand AS brand FROM part " +
        "UNION ALL SELECT 'ZBrand#XX') ORDER BY brand")),

    Q("a11_salted_agg",
      // salted two-phase aggregation over the maximally hot grouping
      // key (3 distinct l_returnflag values across all of lineitem —
      // the shape where one reducer otherwise takes 1/3 of the table):
      // partial agg on (key, salt) bounds any reducer at |hot|/16,
      // final agg merges partials. Semantics-preserving by
      // construction — counts and exact-DECIMAL sums are associative —
      // so the plain GROUP BY is the oracle.
      (s, dir) => graft.ops.Skew.saltedAgg(
          t(s, dir, "lineitem")
            .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")),
          Seq("l_returnflag"), buckets = 16,
          partials = Map(
            "n" -> count(lit(1)),
            "qty" -> sum(col("l_quantity").cast("decimal(18,2)")),
            "rev" -> sum(col("l_extendedprice").cast("decimal(18,2)"))),
          finals = Map(
            "n" -> sum(col("n")),
            "qty" -> sum(col("qty")),
            "rev" -> sum(col("rev"))))
        .select(col("l_returnflag"), col("n"),
          col("qty").cast("double").as("sum_qty"),
          col("rev").cast("double").as("revenue"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    Q("j14_salted_join",
      // salted equi-join: the hot left side spreads each key over 16
      // reducers, the small right side replicates per salt — result ≡
      // the plain inner join, which is the oracle (aggregated per
      // supplier to keep the gate output bounded).
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
        val sup = t(s, dir, "supplier")
          .select(col("s_suppkey").as("suppkey"), col("s_name"))
        graft.ops.Skew.saltedJoin(li, sup, Seq("suppkey"), buckets = 16)
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("revenue"))
          .orderBy("s_name")
      },
      Some("SELECT s_name, count(*) AS n, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY s_name ORDER BY s_name")),

    Q("j15_bloom_semi",
      // bloom-prefiltered semi join: the manual always-on form of
      // Spark's runtime bloom filter — build a bounded bloom over the
      // urgent orders' keys, cut the lineitem scan down BEFORE the
      // shuffle, exact semi join on the survivors. Result ≡ the plain
      // EXISTS semi join at every fpp (no false negatives by
      // construction; the exact join removes false positives), which
      // is the oracle. Probe-side pushdown pinned by PlanQualitySpec.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        graft.ops.BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey",
            expectedItems = 100000L, numBits = 1L << 20)
          .groupBy(col("l_returnflag").as("flag"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"))
          .orderBy("flag")
      },
      Some("SELECT l_returnflag AS flag, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem l WHERE EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_orderpriority = '1-URGENT' " +
        "AND o.o_orderkey = l.l_orderkey) " +
        "GROUP BY 1 ORDER BY 1")),

    Q("o3_param_sort",
      // parameterized sort direction through the REAL Facade.history
      // path (stocks.js:39-47, O3): both parameter values run in one
      // gate, tagged and unioned. The stocks table is derived from
      // orders aggregated to one row per (symbol, day) so the
      // timestamp order within a symbol is total — no tie ambiguity
      // at the LIMIT cut.
      (s, dir) => {
        val st = t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("symbol"),
            to_date(col("o_orderdate")).as("timestamp"))
          .agg(count(lit(1)).as("n"),
            max(col("o_totalprice")).as("close"))
        val e = s.emptyDataFrame
        val api = new Facade(Db(st, e, e, e, e, e, e, e, e, e, e))
        api.history("1-URGENT", asc = true, limit = 50)
          .withColumn("dir", lit("asc"))
          .unionByName(api.history("1-URGENT", asc = false, limit = 50)
            .withColumn("dir", lit("desc")))
          .select(col("symbol"), col("timestamp").as("ts"),
            col("n"), col("close"), col("dir"))
          .orderBy("dir", "ts")
      },
      Some("WITH st AS (SELECT o_orderpriority AS symbol, " +
        "CAST(o_orderdate AS DATE) AS ts, count(*) AS n, " +
        "max(o_totalprice) AS close FROM orders GROUP BY 1, 2), " +
        "a AS (SELECT symbol, ts, n, close, 'asc' AS dir FROM st " +
        "WHERE symbol = '1-URGENT' ORDER BY ts ASC LIMIT 50), " +
        "d AS (SELECT symbol, ts, n, close, 'desc' AS dir FROM st " +
        "WHERE symbol = '1-URGENT' ORDER BY ts DESC LIMIT 50) " +
        "SELECT * FROM (SELECT * FROM a UNION ALL SELECT * FROM d) " +
        "ORDER BY dir, ts")),

    Q("s3_layout_echo",
      // insert+echo through the clustered storage layout (S3/U1 +
      // SURVEY §4 layout): write a lineitem projection via
      // Layout.writeClustered (symbol-bucket partitioning, (symbol,ts)
      // sort), read one symbol back through the bucket-pruned path,
      // and echo the rows — write→read fidelity under the oracle.
      // Partition-pruning itself is pinned by LayoutSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_layout_" + s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        // fresh target per run: a stale directory from a prior run with
        // different buckets/schema (or a dir-hash collision) would
        // poison the read-back — same discipline as m4_stats_cache
        val fs = org.apache.hadoop.fs.FileSystem
          .get(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ts"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        graft.catalog.Layout.writeClustered(src, path, "symbol", "ts",
          numBuckets = 4)
        graft.catalog.Layout.readSymbol(s, path, "R", "symbol",
            numBuckets = 4)
          .select(col("symbol"), col("ts"), col("l_orderkey"),
            col("l_linenumber"), col("qty"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("SELECT l_returnflag AS symbol, CAST(l_shipdate AS DATE) AS ts, " +
        "l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem " +
        "WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber")),

    Q("s32_insert_echo",
      // INSERT + RETURNING through the snapshot-logged APPEND commit
      // (S3, stocks.js:144-148): seed the table with the A/N slices,
      // insert the R slice via Layout.appendClusteredZoned's
      // crash-atomic flip, then echo the INSERTED rows by reading them
      // back THROUGH the table's bucket-pruned path. The oracle
      // recomputes the batch from the raw source, so the echo proves
      // content fidelity of the committed insert itself — not of the
      // in-memory batch frame (s3 gates the initial write; this gates
      // the append).
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_insecho_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        graft.catalog.Layout.writeClusteredZoned(
          src.filter(col("symbol") =!= "R"), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.appendClusteredZoned(
          src.filter(col("symbol") === "R"), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.read(s, path, "symbol", "ship",
            numBuckets = 4, symbolEq = Some("R"))
          .select(col("symbol"), col("ship"), col("l_orderkey"),
            col("l_linenumber"), col("qty"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("SELECT l_returnflag AS symbol, CAST(l_shipdate AS DATE) AS ship, " +
        "l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem " +
        "WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber")),

    Q("s10_zonemap",
      // file-level zone-map data skipping (SURVEY §4 extension): write
      // a range-clustered copy, consult the per-file (min,max)
      // manifest, and scan ONLY the files overlapping the year — the
      // Delta/Iceberg skipping pattern above parquet's row-group
      // stats. Result ≡ the plain range filter (the oracle); the
      // file-count reduction itself is pinned by ZoneMapSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_zonemap_" + s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val fs = org.apache.hadoop.fs.FileSystem
          .get(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_linenumber"), to_date(col("l_shipdate")).as("ship"),
          col("l_quantity"))
        graft.catalog.ZoneMap.writeRangeClustered(src, path, "ship",
          numFiles = 8)
        graft.catalog.ZoneMap.readRange(s, path, "ship",
            lit("1995-01-01").cast("date"), lit("1995-12-31").cast("date"))
          .groupBy(col("ship"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"))
          .orderBy("ship")
      },
      Some("SELECT CAST(l_shipdate AS DATE) AS ship, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE CAST(l_shipdate AS DATE) " +
        "BETWEEN '1995-01-01' AND '1995-12-31' " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s11_clustered_read",
      // the UNIFIED catalog read (Layout.read): bucket partition
      // pruning (key equality, s3's path) AND zone-map file skipping
      // (range, s10's path) composed behind one entry point over the
      // combined writeClusteredZoned layout — result ≡ the plain
      // key+range filter (the oracle); the inputFiles shrinkage under
      // each predicate is pinned by ZoneMapSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_clustered_" + s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        graft.catalog.Layout.writeClusteredZoned(src, path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.read(s, path, "symbol", "ship", numBuckets = 4,
            symbolEq = Some("R"),
            timeRange = Some((lit("1995-01-01").cast("date"),
              lit("1995-12-31").cast("date"))))
          .groupBy(col("ship"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("ship")
      },
      Some("SELECT CAST(l_shipdate AS DATE) AS ship, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE l_returnflag = 'R' AND CAST(l_shipdate AS DATE) " +
        "BETWEEN '1995-01-01' AND '1995-12-31' " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s13_compact_echo",
      // small-file compaction (Layout.compact): write the zoned table
      // deliberately over-fragmented (16 range slices per bucket),
      // bin-pack back to ≤2 files per bucket, then read a key+range
      // slice through the refreshed manifest — content ≡ the plain
      // filter. File-count and manifest mechanics are pinned by
      // LayoutSpec; this gates end-to-end fidelity under the oracle.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_compact_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        graft.catalog.Layout.writeClusteredZoned(src, path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 16)
        graft.catalog.Layout.compact(s, path, "symbol", "ship",
          filesPerBucket = 2)
        graft.catalog.Layout.read(s, path, "symbol", "ship", numBuckets = 4,
            symbolEq = Some("A"),
            timeRange = Some((lit("1996-01-01").cast("date"),
              lit("1996-12-31").cast("date"))))
          .groupBy(col("ship"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("ship")
      },
      Some("SELECT CAST(l_shipdate AS DATE) AS ship, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE l_returnflag = 'A' AND CAST(l_shipdate AS DATE) " +
        "BETWEEN '1996-01-01' AND '1996-12-31' " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s29_recluster",
      // cluster-spec evolution (Layout.recluster): the table starts
      // clustered by returnflag, takes a DV delete, then re-clusters
      // by LINESTATUS in one crash-atomic replace-all flip — the
      // rewrite materializes the deletion vectors into clean files and
      // the new key's bucket pruning works immediately. A key+range
      // read through the re-clustered manifest must equal the plain
      // filter minus the deleted rows; flip atomicity, DV
      // materialization, and prune mechanics are pinned by LayoutSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_recluster_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        graft.catalog.Layout.writeClusteredZoned(src, path, "rf", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.delete(s, path, "ship",
          col("l_orderkey") % 5 === 0)
        graft.catalog.Layout.recluster(s, path, "ls", "ship",
          numBuckets = 4, filesPerBucket = 2)
        graft.catalog.Layout.read(s, path, "ls", "ship", numBuckets = 4,
            symbolEq = Some("F"),
            timeRange = Some((lit("1996-01-01").cast("date"),
              lit("1996-12-31").cast("date"))))
          .groupBy(col("ship"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("ship")
      },
      Some("SELECT CAST(l_shipdate AS DATE) AS ship, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE l_linestatus = 'F' AND l_orderkey % 5 <> 0 " +
        "AND CAST(l_shipdate AS DATE) " +
        "BETWEEN '1996-01-01' AND '1996-12-31' " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s14_append_echo",
      // growing-table ingest (Layout.appendClusteredZoned): the base
      // write holds ≤1996, a second batch appends 1997+ WITHOUT
      // rewriting the table, with the zone manifest updated from just
      // the fresh files; a key+range read SPANNING the append boundary
      // equals the plain filter. Incremental-manifest mechanics are
      // pinned by LayoutSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_append_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        val cut = lit("1997-01-01").cast("date")
        graft.catalog.Layout.writeClusteredZoned(
          src.filter(col("ship") < cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.appendClusteredZoned(
          src.filter(col("ship") >= cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.read(s, path, "symbol", "ship", numBuckets = 4,
            symbolEq = Some("N"),
            timeRange = Some((lit("1996-06-01").cast("date"),
              lit("1997-06-30").cast("date"))))
          .groupBy(col("ship"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("ship")
      },
      Some("SELECT CAST(l_shipdate AS DATE) AS ship, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE l_returnflag = 'N' AND CAST(l_shipdate AS DATE) " +
        "BETWEEN '1996-06-01' AND '1997-06-30' " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s15_time_travel",
      // snapshot time travel: an append commits a NEW snapshot
      // (SnapshotManifest log); reading the PREVIOUS snap name
      // resolves that snapshot's manifest and returns the table
      // exactly as of the pre-append commit — the oracle is the base
      // slice alone, proving the appended rows are invisible to the
      // historical read. Readability of old snaps is bounded by
      // vacuum's keep-last-2 retention (LayoutSpec).
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_travel_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        val cut = lit("1997-01-01").cast("date")
        graft.catalog.Layout.writeClusteredZoned(
          src.filter(col("ship") < cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.appendClusteredZoned(
          src.filter(col("ship") >= cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        val snaps = graft.catalog.Layout.snapshots(s, path)
        graft.catalog.Layout.read(s, path, "symbol", "ship", numBuckets = 4,
            asOfSnap = Some(snaps(snaps.size - 2)))
          .groupBy(col("symbol"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("symbol")
      },
      Some("SELECT l_returnflag AS symbol, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE CAST(l_shipdate AS DATE) < '1997-01-01' " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s16_zorder",
      // z-order (Morton) clustered layout: lineitem rewritten with
      // (l_partkey, shipdate-epoch-day) bit-interleaved, 2-D zone
      // manifest committed through the snapshot log; a range read on
      // BOTH dimensions prunes files from metadata and still equals
      // the plain filter. Per-axis skip effectiveness: ZOrderSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_zorder_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          datediff(to_date(col("l_shipdate")),
            lit("1970-01-01").cast("date")).cast("long").as("d"),
          col("l_quantity").as("qty"))
        graft.catalog.ZOrder.write(src, path, "l_partkey", "d",
          filesTarget = 16)
        graft.catalog.ZOrder.read(s, path, "l_partkey", "d",
            c1Range = Some((lit(100L), lit(600L))),
            c2Range = Some((lit(8800L), lit(9300L))))
          .groupBy((col("d") % 30).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("bucket")
      },
      Some("SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' " +
        "AS BIGINT) % 30 AS bucket, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE l_partkey BETWEEN 100 AND 600 AND " +
        "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) " +
        "BETWEEN 8800 AND 9300 GROUP BY 1 ORDER BY 1")),

    Q("s24_point_skip",
      // per-file bloom equality skipping (Layout.buildBloomIndex):
      // zone maps prune range predicates but are blind to a
      // high-cardinality id scattered across every file's key range;
      // the bloom index lets a point probe open only might-contain
      // files. The probe targets max(l_orderkey) — deterministic at
      // every SF — and the result ≡ the plain equality filter (the
      // oracle). File-open reduction itself is pinned by LayoutSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_bloom_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        // quarter slice: the gate pins bloom-skip mechanics, not write
        // throughput (the s19 discipline)
        val src = t(s, dir, "lineitem")
          .filter(pmod(col("l_partkey"), lit(4)) === 0).select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        graft.catalog.Layout.writeClusteredZoned(src, path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.buildBloomIndex(s, path, "l_orderkey", "ship")
        val key = src.agg(max(col("l_orderkey"))).head.getLong(0)
        graft.catalog.Layout.read(s, path, "symbol", "ship", numBuckets = 4,
            pointEq = Some(("l_orderkey", lit(key))))
          .select(col("symbol"), col("ship"), col("l_orderkey"),
            col("l_linenumber"), col("qty"))
          .orderBy("symbol", "ship", "l_linenumber", "qty")
      },
      Some("SELECT l_returnflag AS symbol, CAST(l_shipdate AS DATE) AS ship, " +
        "l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem " +
        "WHERE l_partkey % 4 = 0 AND l_orderkey = " +
        "(SELECT max(l_orderkey) FROM lineitem WHERE l_partkey % 4 = 0) " +
        "ORDER BY symbol, ship, l_linenumber, qty")),

    Q("s25_zorder3",
      // n-D z-order (ZOrder.writeN): lineitem reclustered on THREE
      // interleaved axes (l_partkey, shipdate-epoch-day, l_suppkey) —
      // the multi-tenant (tenant, time, key) layout — and a range read
      // constraining all three prunes files from metadata while still
      // equaling the plain triple filter. Per-axis skip effectiveness
      // on the 3-D manifest is pinned by ZOrderSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_zorder3_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        // quarter slice: the gate pins 3-axis skip mechanics, not
        // write throughput (the s19 discipline)
        val src = t(s, dir, "lineitem")
          .filter(pmod(col("l_orderkey"), lit(4)) === 0).select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          datediff(to_date(col("l_shipdate")),
            lit("1970-01-01").cast("date")).cast("long").as("d"),
          col("l_quantity").as("qty"))
        graft.catalog.ZOrder.writeN(src, path,
          Seq("l_partkey", "d", "l_suppkey"), filesTarget = 16)
        graft.catalog.ZOrder.readN(s, path, Seq("l_partkey", "d", "l_suppkey"),
            Seq(Some((lit(100L), lit(600L))),
              Some((lit(8800L), lit(9300L))),
              Some((lit(1L), lit(40L)))))
          .groupBy((col("d") % 30).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("bucket")
      },
      Some("SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' " +
        "AS BIGINT) % 30 AS bucket, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE l_orderkey % 4 = 0 AND " +
        "l_partkey BETWEEN 100 AND 600 AND " +
        "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) " +
        "BETWEEN 8800 AND 9300 AND l_suppkey BETWEEN 1 AND 40 " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s17_bucketed_join",
      // storage-co-located join (Bucketing): both sides persisted
      // bucketed + per-bucket-sorted on the join key, then equi-joined
      // with the shuffle-free contract ENFORCED in-plan —
      // colocatedJoin throws on any Exchange under the join, so this
      // gate fails if the zero-shuffle property ever regresses — and
      // the result still equals the plain join. Plan shape also
      // pinned by BucketingSpec.
      (s, dir) => {
        val tag = Integer.toHexString(s.sparkContext.applicationId.hashCode) +
          "_" + Integer.toHexString(dir.hashCode)
        val base = System.getProperty("java.io.tmpdir") + "/graft_bucketed_" + tag
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val o = t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.catalog.Bucketing.writeBucketed(
          li, s"li_bkt_$tag", base + "/li", "l_orderkey", 8)
        graft.catalog.Bucketing.writeBucketed(
          o, s"o_bkt_$tag", base + "/o", "l_orderkey", 8)
        graft.catalog.Bucketing.colocatedJoin(
            s, s"li_bkt_$tag", s"o_bkt_$tag", "l_orderkey")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"))
          .orderBy("o_orderstatus")
      },
      Some("SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s19_delete_vectors",
      // merge-on-read DELETE (Layout.delete): two predicates land as
      // dv_* manifest parts — ZERO data files rewritten, positions
      // only — and the snapshot read anti-joins the live DV, equaling
      // the plain double-filter. Then compact folds the deletes into
      // clean files (purging every dv part) and the SAME aggregate
      // re-runs against the folded snapshot — the union's second half
      // proves the fold preserved content exactly. Crash-atomicity of
      // the delete flip and the fold purge are pinned by LayoutSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_dv_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        // a quarter slice keeps the gate's I/O proportional to what it
        // pins (DV mechanics, not write throughput — s13 covers that)
        val src = t(s, dir, "lineitem")
          .filter(pmod(col("l_partkey"), lit(4)) === 0).select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        graft.catalog.Layout.writeClusteredZoned(
          src, path, "symbol", "ship", numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.delete(s, path, "ship", col("qty") < 10)
        graft.catalog.Layout.delete(s, path, "ship",
          col("ship") >= lit("1998-06-01").cast("date"))
        def agg(phase: String) = graft.catalog.Layout
          .read(s, path, "symbol", "ship", numBuckets = 4)
          .groupBy(col("symbol"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .withColumn("phase", lit(phase))
        val afterDv = agg("dv")
        val countedDv = afterDv.collect() // force before the fold flips
        graft.catalog.Layout.compact(s, path, "symbol", "ship",
          filesPerBucket = 4)
        s.createDataFrame(
            java.util.Arrays.asList(countedDv: _*), afterDv.schema)
          .unionByName(agg("folded"))
          .orderBy("phase", "symbol")
      },
      Some("WITH k AS (SELECT l_returnflag AS symbol, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE l_partkey % 4 = 0 AND NOT (l_quantity < 10) " +
        "AND NOT (CAST(l_shipdate AS DATE) >= DATE '1998-06-01') GROUP BY 1) " +
        "SELECT symbol, n, sum_qty, 'dv' AS phase FROM k " +
        "UNION ALL SELECT symbol, n, sum_qty, 'folded' FROM k " +
        "ORDER BY phase, symbol")),

    Q("s20_change_feed",
      // row-level change data feed (Layout.changes): the window spans
      // one append and one DV delete; the feed emits the appended rows
      // still live at the window's end as 'insert' and the
      // DV-deleted pre-existing rows as 'delete' — net semantics, an
      // appended-then-deleted row emits nothing. Cost is O(changed
      // files): only the appended files and the DV-touched files are
      // scanned, never the whole table.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_cdf_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem")
          .filter(pmod(col("l_partkey"), lit(4)) === 0).select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        val cut = lit("1997-01-01").cast("date")
        graft.catalog.Layout.writeClusteredZoned(
          src.filter(col("ship") < cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        val snap1 = graft.catalog.Layout.snapshots(s, path).last
        graft.catalog.Layout.appendClusteredZoned(
          src.filter(col("ship") >= cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.delete(s, path, "ship", col("qty") < 5)
        val snap3 = graft.catalog.Layout.snapshots(s, path).last
        graft.catalog.Layout.changes(s, path, snap1, snap3)
          .groupBy(col("_change_type"), col("symbol"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("_change_type", "symbol")
      },
      Some("SELECT 'insert' AS _change_type, l_returnflag AS symbol, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE l_partkey % 4 = 0 " +
        "AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01' " +
        "AND NOT (l_quantity < 5) GROUP BY 2 " +
        "UNION ALL SELECT 'delete', l_returnflag, count(*), " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) " +
        "FROM lineitem WHERE l_partkey % 4 = 0 " +
        "AND CAST(l_shipdate AS DATE) < DATE '1997-01-01' " +
        "AND l_quantity < 5 GROUP BY 2 " +
        "ORDER BY _change_type, symbol")),

    Q("s21_replicate",
      // CDC replication (Layout.applyChanges): source and target start
      // as the same snapshot; the source takes one append and one DV
      // delete; the change feed for that window is applied to the
      // target (semi-join keyed delete + O(batch) append, each half
      // crash-atomic on the target's own snapshot log) — and the
      // TARGET's aggregate must equal the source's final state, i.e.
      // the plain double-filter oracle.
      (s, dir) => {
        val base = System.getProperty("java.io.tmpdir") +
          "/graft_repl_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val srcPath = base + "/src"
        val tgtPath = base + "/tgt"
        // orders, not lineitem: CDC keying needs a REAL unique key
        // (o_orderkey; the synthetic lineitem's (orderkey, linenumber)
        // is not unique)
        val src = t(s, dir, "orders").select(
          col("o_orderstatus").as("symbol"),
          to_date(col("o_orderdate")).as("ship"),
          col("o_orderkey"),
          col("o_totalprice").as("qty"))
        val cut = lit("1997-01-01").cast("date")
        val initial = src.filter(col("ship") < cut)
        graft.catalog.Layout.writeClusteredZoned(
          initial, srcPath, "symbol", "ship", numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.writeClusteredZoned(
          initial, tgtPath, "symbol", "ship", numBuckets = 4, filesPerBucket = 4)
        val snap1 = graft.catalog.Layout.snapshots(s, srcPath).last
        graft.catalog.Layout.appendClusteredZoned(
          src.filter(col("ship") >= cut), srcPath, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.delete(s, srcPath, "ship",
          pmod(col("o_orderkey"), lit(7)) === 0)
        val snap3 = graft.catalog.Layout.snapshots(s, srcPath).last
        // epoch = the window identity: the fresh-epoch path sweeps
        // only the feed's delete keys (no pre-delete over the insert
        // batch), with crash-retry convergence via the intent/done
        // markers on the target
        graft.catalog.Layout.applyChanges(
          graft.catalog.Layout.changes(s, srcPath, snap1, snap3),
          tgtPath, "symbol", "ship", keys = Seq("o_orderkey"),
          numBuckets = 4, filesPerBucket = 4,
          epoch = Some(s"${snap1}_$snap3"))
        graft.catalog.Layout.read(s, tgtPath, "symbol", "ship", numBuckets = 4)
          .groupBy(col("symbol"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("symbol")
      },
      Some("SELECT o_orderstatus AS symbol, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM orders WHERE o_orderkey % 7 <> 0 " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s26_cdc_incremental",
      // storage CDC driving a materialized view through DELETES
      // (IncrementalAgg.applyChangeFeed): the per-symbol count/sum
      // view materializes at T0, the table takes one append and one
      // DV delete, and the snapshot change feed folds into the view
      // with signed weights — one feed-sized aggregation + one
      // state-sized join, base facts never re-read; the folded view
      // equals recomputing from the final table (the oracle). The
      // retraction algebra itself is pinned by IncrementalAggSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_cdcview_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        // quarter slice: the gate pins the CDC→view loop, not write
        // throughput (the s19 discipline)
        val src = t(s, dir, "orders")
          .filter(pmod(col("o_orderkey"), lit(4)) === 0).select(
          col("o_orderstatus").as("symbol"),
          to_date(col("o_orderdate")).as("ship"),
          col("o_orderkey"),
          col("o_totalprice").as("qty"))
        val cut = lit("1997-01-01").cast("date")
        graft.catalog.Layout.writeClusteredZoned(
          src.filter(col("ship") < cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        val snap1 = graft.catalog.Layout.snapshots(s, path).last
        val st0 = graft.ops.IncrementalAgg.retractableState(
          graft.catalog.Layout.read(s, path, "symbol", "ship",
            numBuckets = 4),
          Seq("symbol"), Seq("qty"))
        graft.catalog.Layout.appendClusteredZoned(
          src.filter(col("ship") >= cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.delete(s, path, "ship",
          pmod(col("o_orderkey"), lit(7)) === 0)
        val snap3 = graft.catalog.Layout.snapshots(s, path).last
        val feed = graft.catalog.Layout.changes(s, path, snap1, snap3)
        graft.ops.IncrementalAgg.applyChangeFeed(
            st0, feed, Seq("symbol"), Seq("qty"))
          .select(col("symbol"), col("__cnt").as("n"),
            col("sum_qty").cast("double").as("sum_qty"))
          .orderBy("symbol")
      },
      Some("SELECT o_orderstatus AS symbol, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 7 <> 0 " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s22_retention",
      // time-retention expiry (Layout.expireBefore): rows before the
      // cutoff age out of the zoned table — completely-expired files
      // leave the manifest WITHOUT being opened (metadata-only, the
      // dominant case for a time-clustered layout), straddle files
      // get a deletion vector for their sub-cutoff rows; the read
      // equals the plain filter. File-drop accounting and the
      // crash-atomic flip are pinned by LayoutSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_retain_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "orders").select(
          col("o_orderstatus").as("symbol"),
          to_date(col("o_orderdate")).as("ship"),
          col("o_orderkey"),
          col("o_totalprice").as("qty"))
        graft.catalog.Layout.writeClusteredZoned(
          src, path, "symbol", "ship", numBuckets = 4, filesPerBucket = 6)
        graft.catalog.Layout.expireBefore(s, path, "ship",
          lit("1995-01-01").cast("date"))
        graft.catalog.Layout.read(s, path, "symbol", "ship", numBuckets = 4)
          .groupBy(col("symbol"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("symbol")
      },
      Some("SELECT o_orderstatus AS symbol, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01' " +
        "GROUP BY 1 ORDER BY 1")),

    Q("s28_metadata_count",
      // metadata-only COUNT(*) (Layout.countFast): Σ manifest n_rows
      // − |deletion vector| — no data file opened. Exercised across a
      // DV delete so the logical/physical distinction is live; the
      // oracle pays the real filtered count. Append/time-travel/
      // compaction accounting is pinned by LayoutSpec.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_cfast_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val src = t(s, dir, "lineitem").select(
          col("l_returnflag").as("symbol"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"))
        graft.catalog.Layout.writeClusteredZoned(
          src, path, "symbol", "ship", numBuckets = 4)
        graft.catalog.Layout.deleteWhere(s, path, "ship",
          _.filter(col("qty") < 10))
        val n = graft.catalog.Layout.countFast(s, path)
        s.range(1).select(lit(n).as("n"))
      },
      Some("SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem " +
        "WHERE NOT (l_quantity < 10)")),

    Q("s23_schema_evolution",
      // additive schema evolution: the table starts without `prio`,
      // a later batch appends WITH it, and a mergeSchema read unions
      // the file schemas — pre-evolution rows surface NULL prio
      // (count(prio) counts only post-evolution rows), values
      // unchanged. The zone manifest and bucket layout are untouched
      // by the widened schema.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_evolve_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val o = t(s, dir, "orders")
        val cut = lit("1997-01-01").cast("date")
        val v1 = o.select(col("o_orderstatus").as("symbol"),
          to_date(col("o_orderdate")).as("ship"),
          col("o_orderkey"), col("o_totalprice").as("qty"))
        val v2 = o.select(col("o_orderstatus").as("symbol"),
          to_date(col("o_orderdate")).as("ship"),
          col("o_orderkey"), col("o_totalprice").as("qty"),
          col("o_orderpriority").as("prio"))
        graft.catalog.Layout.writeClusteredZoned(
          v1.filter(col("ship") < cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.appendClusteredZoned(
          v2.filter(col("ship") >= cut), path, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4)
        graft.catalog.Layout.read(s, path, "symbol", "ship", numBuckets = 4,
            mergeSchema = true)
          .groupBy(col("symbol"))
          .agg(count(lit(1)).as("n"), count(col("prio")).as("n_prio"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("symbol")
      },
      Some("SELECT o_orderstatus AS symbol, count(*) AS n, " +
        "count(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1997-01-01' " +
        "THEN o_orderpriority END) AS n_prio, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM orders GROUP BY 1 ORDER BY 1")),

    Q("u10_serial_keys",
      // SERIAL surrogate-key allocation (§7.4 risk 1): deterministic
      // dense ids for a batch of new rows, offset past the current
      // max of an existing table — row_number over an explicit total
      // order, the reproducible-run variant (allocateUnique's
      // monotonically_increasing_id is uniqueness-only and cannot be
      // oracle-checked by construction).
      (s, dir) => {
        val newRows = t(s, dir, "orders").select(col("o_orderpriority"))
          .distinct()
        val maxId = graft.ops.Keys.currentMax(t(s, dir, "customer"), "c_custkey")
        graft.ops.Keys.allocateDense(newRows, "id", maxId,
            Seq(col("o_orderpriority")))
          .select(col("id"), col("o_orderpriority"))
          .orderBy("id")
      },
      Some("SELECT (SELECT max(c_custkey) FROM customer) + " +
        "row_number() OVER (ORDER BY o_orderpriority) AS id, " +
        "o_orderpriority FROM (SELECT DISTINCT o_orderpriority FROM orders) " +
        "ORDER BY id")),

    Q("v1_constraint_audit",
      // constraint validation as set-based audit operators (§7.4 risk
      // 2; schema.sql PK/FK/CHECK surface): PK dupes on a planted
      // duplicate batch, FK orphans against a halved parent set, CHECK
      // violations on a quantity bound — counted into the
      // (check_name, n_violations) dashboard shape via Validate.audit.
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val pk = graft.ops.Validate.primaryKey(
          li.unionByName(li.filter(col("l_linenumber") === 1)),
          Seq("l_orderkey", "l_linenumber"))
        val fk = graft.ops.Validate.foreignKey(
          t(s, dir, "orders"),
          t(s, dir, "customer").filter(pmod(col("c_custkey"), lit(2)) === 0),
          Seq("o_custkey"), Seq("c_custkey"))
        val ck = graft.ops.Validate.check(li, col("l_quantity") <= 49)
        graft.ops.Validate.audit(Map("pk" -> pk, "fk" -> fk, "check" -> ck))
          .toDF("check_name", "n_violations")
          .orderBy("check_name")
      },
      Some("SELECT 'check' AS check_name, (SELECT count(*) FROM lineitem " +
        "WHERE NOT (l_quantity <= 49)) AS n_violations " +
        "UNION ALL SELECT 'fk', (SELECT count(*) FROM orders o WHERE NOT EXISTS " +
        "(SELECT 1 FROM customer c WHERE c.c_custkey % 2 = 0 " +
        "AND c.c_custkey = o.o_custkey)) " +
        "UNION ALL SELECT 'pk', (SELECT count(*) FROM " +
        "(SELECT l_orderkey, l_linenumber FROM " +
        "(SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem " +
        "WHERE l_linenumber = 1) GROUP BY 1, 2 HAVING count(*) > 1)) " +
        "ORDER BY check_name")),

    Q("v2_profile",
      // column profiling (Profile.profile): one aggregation pass
      // produces every column's row/null/distinct counts, stringified
      // min/max, and exact-decimal mean, unpivoted to long format.
      // The date column is pre-projected (timestamp→date) so the
      // string rendering is engine-neutral; means follow the
      // DECIMAL(27,6)-sum parity convention.
      (s, dir) => graft.analytics.Profile.profile(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"),
            col("l_returnflag"), to_date(col("l_shipdate")).as("ship")),
          Seq("l_orderkey", "l_quantity", "l_returnflag", "ship"))
        .orderBy("col_name"),
      Some(Seq(
        ("l_orderkey", "l_orderkey", true),
        ("l_quantity", "l_quantity", true),
        ("l_returnflag", "l_returnflag", false),
        ("ship", "CAST(l_shipdate AS DATE)", false)).map {
          case (name, expr, numeric) =>
            val mean = if (numeric)
              s"round(CAST(sum(CAST($expr AS DECIMAL(27,6))) AS DOUBLE) " +
                s"/ count($expr), 6)"
            else "CAST(NULL AS DOUBLE)"
            s"SELECT '$name' AS col_name, count(*) AS n_rows, " +
              s"count(*) - count($expr) AS n_nulls, " +
              s"count(DISTINCT $expr) AS n_distinct, " +
              s"CAST(min($expr) AS VARCHAR) AS min_s, " +
              s"CAST(max($expr) AS VARCHAR) AS max_s, " +
              s"$mean AS mean FROM lineitem"
        }.mkString("", " UNION ALL ", " ORDER BY col_name"))),

    Q("v3_k_anonymity",
      // k-anonymity audit + suppression (Privacy, Sweeney 2002): the
      // quasi-identifier classes of orders (status, priority,
      // order-year) are audited at k=100 — classes below k come from
      // kAnonymityViolations, the release frame from
      // suppressSmallGroups — and the union re-derives EVERY class
      // with its suppression flag, so the gate pins that enforcement
      // removed exactly the violating classes and nothing else.
      (s, dir) => {
        val qi = Seq("status", "prio", "yr")
        val o = t(s, dir, "orders").select(
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"),
          year(to_date(col("o_orderdate"))).cast("long").as("yr"))
        val viol = graft.analytics.Privacy.kAnonymityViolations(o, qi, 100)
          .withColumn("suppressed", lit(true))
        val kept = graft.analytics.Privacy.suppressSmallGroups(o, qi, 100)
          .groupBy(qi.map(col): _*)
          .agg(count(lit(1)).as("n"))
          .withColumn("suppressed", lit(false))
        viol.unionByName(kept).orderBy("status", "prio", "yr")
      },
      Some("SELECT o_orderstatus AS status, o_orderpriority AS prio, " +
        "year(CAST(o_orderdate AS DATE)) AS yr, count(*) AS n, " +
        "count(*) < 100 AS suppressed FROM orders " +
        "GROUP BY 1, 2, 3 ORDER BY status, prio, yr")),

    Q("v5_l_diversity",
      // ℓ-diversity audit (Privacy.lDiversityViolations,
      // Machanavajjhala et al. 2006): QI classes of customers
      // (segment, nation) whose rows carry fewer than 8 distinct
      // sensitive values (banded account balance) — the homogeneity
      // attack k-anonymity misses: a class can be big (k-anonymous)
      // yet disclose its members' balance band. One hash aggregation
      // on the QI key; the gate emits the violating classes with
      // size and diversity.
      (s, dir) => graft.analytics.Privacy.lDiversityViolations(
          t(s, dir, "customer").select(
            col("c_mktsegment").as("seg"),
            col("c_nationkey").as("nk"),
            floor(col("c_acctbal") / 1000).cast("long").as("bal_band")),
          Seq("seg", "nk"), "bal_band", l = 8)
        .orderBy("seg", "nk"),
      Some("SELECT c_mktsegment AS seg, c_nationkey AS nk, " +
        "count(*) AS n, " +
        "count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS diversity " +
        "FROM customer GROUP BY 1, 2 HAVING diversity < 8 " +
        "ORDER BY seg, nk")),

    Q("u11_scd2",
      // type-2 slowly-changing-dimension historization: the orders
      // stream as a per-customer changelog of (status, priority), no-op
      // changes collapsed, each surviving version carrying a
      // [valid_from, valid_to) interval — the scale-out generalization
      // of the reference's overwrite-in-place updates (statistics
      // cache write-back, profile edits). Incremental merge parity for
      // append-style batches (merge(historize(a), b) ≡ historize(a ∪ b)
      // when b's changes follow a's per key) is pinned by ScdSpec and
      // a GraftProperties property.
      (s, dir) => {
        val log = t(s, dir, "orders").select(
          col("o_custkey").as("custkey"),
          col("o_orderdate").cast("date").as("ts"),
          col("o_orderkey").as("ord"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"))
        graft.ops.Scd.historize(log, Seq("custkey"), "ts", "ord",
            Seq("status", "prio"))
          // valid_to in the sort: a same-day A->B->A pattern yields two
          // versions sharing (custkey, valid_from, status, prio)
          .orderBy(col("custkey"), col("valid_from"), col("status"),
            col("prio"), col("valid_to"))
      },
      Some("WITH log AS (SELECT o_custkey AS custkey, " +
        "CAST(o_orderdate AS DATE) AS ts, o_orderkey AS ord, " +
        "o_orderstatus AS status, o_orderpriority AS prio FROM orders), " +
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

    Q("u12_merge",
      // full three-clause ANSI MERGE (Kernels.merge3): a CDC-style
      // source batch carries repriced existing orders (every 7th key,
      // price doubled) and brand-new orders (every 11th key, shifted
      // id) — matched rows whose source price exceeds 350k DELETE,
      // the rest of the matched UPDATE to the source row, unmatched
      // source rows INSERT. One full-outer join on the key; the
      // oracle is the same clause routing as an explicit FULL OUTER
      // + CASE, so the flag algebra (not a mirrored impl) is pinned.
      (s, dir) => {
        val tgt = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val src = tgt.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") * 2).as("o_totalprice"))
          .unionByName(tgt.filter(col("o_orderkey") % 11 === 0)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              lit("N").as("o_orderstatus"), lit(100.0).as("o_totalprice")))
        graft.ops.Kernels.merge3(tgt, src, Seq("o_orderkey"),
            deleteWhen = Some(col("s.o_totalprice") > 350000.0))
          .orderBy("o_orderkey")
      },
      Some("WITH tgt AS (SELECT o_orderkey, o_orderstatus, o_totalprice " +
        "FROM orders), " +
        "src AS (SELECT o_orderkey, o_orderstatus, " +
        "o_totalprice * 2 AS o_totalprice FROM tgt WHERE o_orderkey % 7 = 0 " +
        "UNION ALL SELECT o_orderkey + 10000000, 'N', 100.0 FROM tgt " +
        "WHERE o_orderkey % 11 = 0) " +
        "SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey, " +
        "CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus " +
        "ELSE t.o_orderstatus END AS o_orderstatus, " +
        "CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice " +
        "ELSE t.o_totalprice END AS o_totalprice " +
        "FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey " +
        "WHERE NOT (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL " +
        "AND s.o_totalprice > 350000.0) " +
        "ORDER BY o_orderkey")),

    Q("u14_incremental_join",
      // incremental materialized-JOIN maintenance (IncrementalJoin):
      // the orders⋈customer view is built from pre-1997 orders and
      // 9/10ths of customers, then BOTH sides grow (1997+ orders; the
      // custkey%10=0 customers) and the view is refreshed with two
      // Δ-probe-sided joins — the old sides are never re-joined with
      // each other. The oracle is the full re-join: refresh must equal
      // it as a row multiset. Rolled up per (year, segment) so the
      // gate output is compact while every view row still counts.
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("yr"))
        val c = t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        val cut = col("yr") >= 1997
        val isNewC = pmod(col("o_custkey"), lit(10)) === 0
        val dC = c.filter(isNewC)
        val cOld = c.filter(!isNewC)
        val m0 = graft.ops.IncrementalJoin.joinState(
          o.filter(!cut), cOld, Seq("o_custkey"))
        graft.ops.IncrementalJoin.refreshJoin(m0,
            o.filter(!cut), cOld, o.filter(cut), dC,
            Seq("o_custkey"))
          .groupBy(col("yr"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("total"))
          .orderBy("yr", "c_mktsegment")
      },
      Some("SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr, " +
        "c_mktsegment, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2")),

    Q("u13_incremental_agg",
      // incremental materialized-aggregate maintenance
      // (IncrementalAgg): the per-customer-bucket rollup is built
      // from pre-1997 orders only, then the 1997+ batch is FOLDED IN
      // via mergeable states (count / exact-decimal sum / min / max)
      // — the base facts are never re-read. The oracle recomputes the
      // same rollup directly over ALL orders, so the gate pins
      // refresh(state(A), B) ≡ state(A ∪ B) bit-for-bit (sums exact
      // DECIMAL; avg derived at read time, round 4).
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          pmod(col("o_custkey"), lit(100)).as("cust_bucket"),
          col("o_totalprice"), col("o_orderdate").cast("date").as("d"))
        val cut = lit("1997-01-01").cast("date")
        val st = graft.ops.IncrementalAgg.state(
          o.filter(col("d") < cut), Seq("cust_bucket"), Seq("o_totalprice"))
        graft.ops.IncrementalAgg.refresh(st, o.filter(col("d") >= cut),
            Seq("cust_bucket"), Seq("o_totalprice"))
          .select(col("cust_bucket"), col("__cnt").as("n"),
            col("sum_o_totalprice").cast("double").as("sum_price"),
            col("min_o_totalprice").as("min_price"),
            col("max_o_totalprice").as("max_price"),
            round(col("sum_o_totalprice").cast("double") / col("__cnt"), 4)
              .as("avg_price"))
          .orderBy("cust_bucket")
      },
      Some("SELECT o_custkey % 100 AS cust_bucket, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, " +
        "min(o_totalprice) AS min_price, max(o_totalprice) AS max_price, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) " +
        "/ count(*), 4) AS avg_price FROM orders GROUP BY 1 ORDER BY 1")),

    Q("p5_ilike_search",
      // case-insensitive substring page (users.js:50-53)
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_name").ilike("%12%"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey").limit(20),
      Some("SELECT c_custkey, c_name FROM customer WHERE c_name ILIKE '%12%' " +
        "ORDER BY c_custkey LIMIT 20")),

    Q("p2_composite_lookup",
      // composite-key / ownership conjunctive predicate
      // (stocks.js:89-92 P2, portfolio.js:58-61 P6)
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_suppkey") === 5 && col("l_linenumber") === 3)
        .select(col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as("ship_day"),
          col("l_extendedprice").as("price"))
        .orderBy("l_orderkey"),
      Some("SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day, " +
        "l_extendedprice AS price FROM lineitem " +
        "WHERE l_suppkey = 5 AND l_linenumber = 3 ORDER BY l_orderkey")),

    Q("j9_portfolio_value",
      // portfolio valuation: holdings ⋈ latest price, Σ shares×close
      // (portfolio.js:282-311 A7/J9/J11 — the N+1 loop as one job)
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val px = Kernels.latestPerKey(
            li.select("l_partkey", "l_orderkey", "l_linenumber",
              "l_shipdate", "l_extendedprice"),
            Seq("l_partkey"),
            Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
          .select(col("l_partkey"), col("l_extendedprice").as("close"))
        val h = li.filter(to_date(col("l_shipdate")) >= "1997-01-01")
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("l_quantity")).as("shares"))
        graft.analytics.TimeSeries.portfolioValue(h, px,
            "l_suppkey", "l_partkey", col("shares"), col("close"))
          .select(col("l_suppkey"), round(col("market_value"), 2).as("market_value"))
          .orderBy("l_suppkey")
      },
      Some("WITH px AS (SELECT l_partkey, l_extendedprice AS close FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY l_partkey ORDER BY " +
        "l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn FROM lineitem) " +
        "WHERE rn = 1), " +
        "h AS (SELECT l_suppkey, l_partkey, sum(l_quantity) AS shares FROM lineitem " +
        "WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01' GROUP BY 1, 2) " +
        "SELECT l_suppkey, round(sum(shares * close), 2) AS market_value " +
        "FROM h JOIN px USING (l_partkey) GROUP BY l_suppkey ORDER BY l_suppkey")),

    Q("j2_multihop_join",
      // two-hop dimension enrichment (reviews.js/lists.js join shapes)
      // — both dims broadcast, zero shuffles on the fact side
      (s, dir) => t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("s_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
        .orderBy("r_name"),
      Some("SELECT r_name, count(*) AS n_suppliers, " +
        "CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name")),

    Q("j7_union_of_equijoins",
      // friends-of-v disjunctive join (users.js:68-77) rewritten as a
      // union of two equi-joins over normalized edges (SURVEY J7)
      (s, dir) => {
        val edges = Kernels.normalizeEdge(
          t(s, dir, "lineitem").select(col("l_suppkey").as("a"),
            pmod(col("l_partkey"), lit(100)).as("b")),
          "a", "b").distinct()
        Kernels.neighborsOf(edges, "u1", "u2", lit(7))
          .join(t(s, dir, "supplier"), col("neighbor") === col("s_suppkey"))
          .select(col("neighbor"), col("s_name"))
          .orderBy("neighbor")
      },
      Some("WITH edges AS (SELECT DISTINCT least(l_suppkey, l_partkey % 100) AS u1, " +
        "greatest(l_suppkey, l_partkey % 100) AS u2 FROM lineitem), " +
        "nb AS (SELECT u2 AS neighbor FROM edges WHERE u1 = 7 " +
        "UNION ALL SELECT u1 FROM edges WHERE u2 = 7) " +
        "SELECT neighbor, s_name FROM nb JOIN supplier ON neighbor = s_suppkey " +
        "ORDER BY neighbor")),

    Q("j16_mutual_pairs",
      // mutual-neighbor counting over the j7 friend graph
      // (Kernels.mutualNeighborCounts): two-hop equi self-join on the
      // shared neighbor, one count agg per pair — the set-returning
      // generalization of the reference's per-user neighbor read
      // (users.js:68-77).
      (s, dir) => {
        // key-bounded subgraph (suppkey ≤ 100 — the st4 discipline):
        // the mutual-pair candidate space is Σ deg(w)² BY NATURE, so
        // the gate pins semantics on a graph whose size is stable
        // across SFs instead of scaling quadratically with suppliers
        val edges = Kernels.normalizeEdge(
          t(s, dir, "lineitem").filter(col("l_suppkey") <= 100)
            .select(col("l_suppkey").as("a"),
              pmod(col("l_partkey"), lit(100)).as("b")),
          "a", "b").filter(col("u1") =!= col("u2")).distinct()
        Kernels.mutualNeighborCounts(edges, "u1", "u2")
          .filter(col("mutuals") >= 40)
          .orderBy("x", "y")
      },
      Some("WITH edges AS (SELECT DISTINCT least(l_suppkey, l_partkey % 100) AS u1, " +
        "greatest(l_suppkey, l_partkey % 100) AS u2 FROM lineitem " +
        "WHERE l_suppkey <= 100 AND l_suppkey <> l_partkey % 100), " +
        "adj AS (SELECT u1 AS u, u2 AS w FROM edges " +
        "UNION ALL SELECT u2, u1 FROM edges) " +
        "SELECT a.u AS x, b.u AS y, count(*) AS mutuals " +
        "FROM adj a JOIN adj b ON a.w = b.w AND a.u < b.u " +
        "GROUP BY 1, 2 HAVING count(*) >= 40 ORDER BY x, y")),

    Q("j17_full_outer",
      // FULL OUTER join — the one join type the reference never needs
      // (its app code always probes one side) but a complete engine
      // must have: per-nation customer counts vs supplier counts with
      // DISJOINT key ranges forced on each side, so both unmatched
      // directions are exercised; nulls coalesced to 0/key on both
      // engines identically.
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_nationkey") >= 5)
          .groupBy(col("c_nationkey").as("nation"))
          .agg(count(lit(1)).as("n_cust"))
        val su = t(s, dir, "supplier").filter(col("s_nationkey") < 15)
          .groupBy(col("s_nationkey").as("nation"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(su, Seq("nation"), "full_outer")
          .select(col("nation"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nation")
      },
      Some("SELECT coalesce(c.nation, s.nation) AS nation, " +
        "coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp " +
        "FROM (SELECT c_nationkey AS nation, count(*) AS n_cust " +
        "FROM customer WHERE c_nationkey >= 5 GROUP BY 1) c " +
        "FULL OUTER JOIN (SELECT s_nationkey AS nation, count(*) AS n_supp " +
        "FROM supplier WHERE s_nationkey < 15 GROUP BY 1) s " +
        "ON c.nation = s.nation ORDER BY nation")),

    Q("j12_anti_probe",
      // negative existence probe (users.js:318-326 inverse) → left_anti
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderpriority = '1-URGENT') ORDER BY c_custkey")),

    Q("a7_sum_product",
      // portfolio market value Σ close×shares (portfolio.js:288-304)
      // shape: revenue = Σ price×(1-discount) per group
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, CAST(sum(CAST(l_extendedprice * (1 - l_discount) " +
        "AS DECIMAL(18,4))) AS DOUBLE) AS revenue FROM lineitem " +
        "GROUP BY l_returnflag ORDER BY l_returnflag")),

    Q("u6_trading_fold",
      // the buy/sell avg-cost ordered fold (trading.js:83-85,185-199;
      // SURVEY A8/U6/U7) via the custom groupByKey fold in
      // graft.domain.Trading. Demo trade stream derived
      // deterministically from events: first trade per key is a large
      // opening buy, the last two (when the key has ≥5 events) are
      // unit sells — so the guarded fold's output is expressible in
      // SQL for the oracle (sells never reject, positions never close;
      // the reset/reject branches are covered by TradingSpec).
      (s, dir) => {
        import s.implicits._
        val (trades, closedAvg) = demoTrades(s, dir)
        Trading.replay(trades.as[Trade]).toDF()
          .drop("avg_cost")
          .join(closedAvg, Seq("portfolio", "symbol"))
          .select(col("portfolio"), col("symbol"), col("shares"),
            col("avg_cost"), col("n_rejected"))
          .orderBy("portfolio", "symbol")
      },
      Some(holdFoldOracle)),

    Q("u9_hold_fold_sql",
      // the same guarded fold driven through the SQL surface: the
      // custom TypedImperativeAggregate hold_fold (update/serialize/
      // merge/eval across partial aggregation) registered as a temp
      // function and invoked from spark.sql — shares/n_rejected come
      // from the aggregate's ordered fold; avg_cost from the shared
      // closed-form quotient (see demoTrades)
      (s, dir) => {
        graft.functions.HoldingFoldAgg.register(s)
        val (trades, closedAvg) = demoTrades(s, dir)
        trades.createOrReplaceTempView("u9_trades")
        s.sql("SELECT portfolio, symbol, " +
            "hold_fold(ts, seq, side, qty, price) AS h " +
            "FROM u9_trades GROUP BY portfolio, symbol")
          .select(col("portfolio"), col("symbol"),
            col("h.shares").as("shares"), col("h.n_rejected").as("n_rejected"))
          .join(closedAvg, Seq("portfolio", "symbol"))
          .select(col("portfolio"), col("symbol"), col("shares"),
            col("avg_cost"), col("n_rejected"))
          .orderBy("portfolio", "symbol")
      },
      Some(holdFoldOracle)),

    Q("m4_stats_cache",
      // the reference's statistics_cache memoization flow end-to-end
      // (schema.sql:101-110; probe portfolio.js:329-345, write-back
      // portfolio.js:427-445): the cache is seeded for half the keys
      // through the STREAMING merge path (Streams.upsertSink →
      // StatsCache.writeBack), then getOrCompute over all keys runs
      // the broadcast-semi probe (hits = the seeded evens), ONE
      // selective recompute for all odd misses together (the
      // reference pays a per-symbol loop), an upsert write-back that
      // flips a fresh snapshot, and a re-probe reading one consistent
      // version. Memoization semantics guarantee result ≡ full
      // recompute, which is exactly the oracle.
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val root = System.getProperty("java.io.tmpdir") +
          "/graft_statscache_" + s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        // fresh cache per run — the gate pins the flow, not persistence
        val fs = org.apache.hadoop.fs.FileSystem
          .get(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = t(s, dir, "events")
        def statsFor(keys: DataFrame): DataFrame =
          ev.join(broadcast(keys.select("user_id")), Seq("user_id"), "left_semi")
            .groupBy("user_id").agg(
              count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
              min("value").as("vmin"), max("value").as("vmax"),
              round(stddev_pop(col("value")), 6).as("sd"))
        // seed snapshot 1 via the streaming sink; the collect is
        // bounded by the cache's nature (one row per key)
        val seed = statsFor(ev.filter(pmod(col("user_id"), lit(2)) === 0)
            .select("user_id").distinct())
          .as[(Long, Long, Double, Double, Double, Double)].collect()
        val mem = MemoryStream[(Long, Long, Double, Double, Double, Double)]
        val sink = Streams.upsertSink(
          mem.toDF().toDF("user_id", "n", "total", "vmin", "vmax", "sd"),
          root, Seq("user_id"))
        try { mem.addData(seed.toIndexedSeq); sink.processAllAvailable() }
        finally sink.stop()
        val cache = new graft.analytics.StatsCache(s, root, Seq("user_id"))
        cache.getOrCompute(ev.select("user_id").distinct(), statsFor)
          .drop("updated_at")
          .orderBy("user_id")
      },
      Some("SELECT user_id, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, " +
        "min(value) AS vmin, max(value) AS vmax, " +
        "round(stddev_pop(value), 6) AS sd " +
        "FROM events GROUP BY user_id ORDER BY user_id")),

    Q("j13_asof_join",
      // as-of join (SURVEY J11 generalization): each event carries the
      // latest 'signup' rate at-or-before its timestamp per user —
      // union-merge + last(ignoreNulls) window, one shuffle; oracle is
      // DuckDB's native ASOF LEFT JOIN
      (s, dir) => {
        val ev = t(s, dir, "events")
        val rates = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("rts"), col("value").as("rate"))
        graft.ops.AsOf.join(
            ev.select(col("event_id"), col("user_id"), col("ts")),
            rates, Seq("user_id"), "ts", "rts", Seq("rate"))
          .select(col("event_id"), col("user_id"), col("rate"))
          .orderBy("event_id")
      },
      // tie-proof oracle: AsOf.join resolves same-(key, ts) right ties
      // to the GREATEST value tuple, while DuckDB ASOF's pick among
      // tied rows is unspecified — pre-aggregate to max(value) per
      // (user_id, ts) so both sides agree whatever the data
      Some("WITH rates AS (SELECT user_id, ts AS rts, max(value) AS rate " +
        "FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) " +
        "SELECT e.event_id, e.user_id, r.rate FROM events e " +
        "ASOF LEFT JOIN rates r ON e.user_id = r.user_id AND e.ts >= r.rts " +
        "ORDER BY e.event_id")),

    Q("j28_asof_forward",
      // FORWARD as-of (pandas merge_asof direction='forward'): each
      // event carries the EARLIEST 'purchase' value at-or-after its
      // timestamp per user — "what does this user buy next?", the
      // label-attachment join of behavioral training data. Same
      // union-merge kernel as j13 run over a DESCENDING ts sort (the
      // frame still ends at the current row — the incremental window
      // path, never the per-row-rebuilt unbounded-following frame),
      // with same-ts purchases sorting visible (>=). Oracle is
      // DuckDB's native ASOF with the inequality reversed.
      (s, dir) => {
        val ev = t(s, dir, "events")
        val nxt = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value").as("next_buy"))
        graft.ops.AsOf.join(
            ev.select(col("event_id"), col("user_id"), col("ts")),
            nxt, Seq("user_id"), "ts", "pts", Seq("next_buy"),
            direction = "forward")
          .select(col("event_id"), col("user_id"), col("next_buy"))
          .orderBy("event_id")
      },
      // tie-proofed like j13: max(value) per (user_id, ts) matches
      // AsOf's greatest-tuple tie rule; DuckDB's tied pick is
      // unspecified
      Some("WITH nxt AS (SELECT user_id, ts AS pts, max(value) AS next_buy " +
        "FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) " +
        "SELECT e.event_id, e.user_id, n.next_buy FROM events e " +
        "ASOF LEFT JOIN nxt n ON e.user_id = n.user_id AND e.ts <= n.pts " +
        "ORDER BY e.event_id")),

    Q("j29_asof_nearest",
      // NEAREST as-of (pandas merge_asof direction='nearest'): each
      // event carries whichever 'signup' rate is CLOSER in time per
      // user, the backward match winning exact ties — sensor/quote
      // alignment where staleness cuts both ways. One shuffle; the
      // backward and forward carries share the partitioning and each
      // runs as an incremental frame-ends-at-current-row pass (the
      // forward one over a DESCENDING sort — never the per-row-rebuilt
      // unbounded-following frame), so nearest pays one extra local
      // sort, not a second exchange; the winner compares exact
      // integer µs distances. The oracle
      // recomposes nearest from DuckDB's two directional ASOFs
      // (at-or-before, strictly-after) with the same epoch_us
      // arithmetic.
      (s, dir) => {
        val ev = t(s, dir, "events")
        val rates = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("rts"), col("value").as("rate"))
        graft.ops.AsOf.join(
            ev.select(col("event_id"), col("user_id"), col("ts")),
            rates, Seq("user_id"), "ts", "rts", Seq("rate"),
            direction = "nearest")
          .select(col("event_id"), col("user_id"), col("rate"))
          .orderBy("event_id")
      },
      // tie-proofed like j13 (max per (user_id, ts) on the right CTE)
      Some("WITH rates AS (SELECT user_id, ts AS rts, max(value) AS rate " +
        "FROM events WHERE event_type = 'signup' GROUP BY user_id, ts), " +
        "bw AS (SELECT e.event_id, r.rate AS brate, r.rts AS brts " +
        "FROM events e ASOF LEFT JOIN rates r " +
        "ON e.user_id = r.user_id AND e.ts >= r.rts), " +
        "fw AS (SELECT e.event_id, r.rate AS frate, r.rts AS frts " +
        "FROM events e ASOF LEFT JOIN rates r " +
        "ON e.user_id = r.user_id AND e.ts < r.rts) " +
        "SELECT e.event_id, e.user_id, " +
        "CASE WHEN frts IS NULL THEN brate WHEN brts IS NULL THEN frate " +
        "WHEN epoch_us(frts) - epoch_us(e.ts) < " +
        "epoch_us(e.ts) - epoch_us(brts) THEN frate ELSE brate END AS rate " +
        "FROM events e JOIN bw USING (event_id) JOIN fw USING (event_id) " +
        "ORDER BY e.event_id")),

    Q("j18_range_join",
      // binned point-in-interval range join (RangeJoin.pointInInterval,
      // 30-day bins): shipments falling inside sampled orders' 60-day
      // windows, across keys — no equality exists, so a naive plan is
      // a cartesian; the bin equi-key makes it a shuffle hash join
      // (inequality-join family: j13 as-of = nearest-predecessor, j18
      // = containment). Oracle = DuckDB's native BETWEEN join;
      // per-interval count + lag checksum keeps the shape compact.
      (s, dir) => {
        val epoch = lit("1970-01-01").cast("date")
        val points = t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 37 === 0)
          .select(col("l_orderkey"), datediff(to_date(col("l_shipdate")),
            epoch).cast("long").as("d"))
        val intervals = t(s, dir, "orders")
          .filter(col("o_orderkey") % 331 === 0)
          .select(col("o_orderkey"), datediff(to_date(col("o_orderdate")),
            epoch).cast("long").as("lo"))
          .withColumn("hi", col("lo") + 60)
        graft.ops.RangeJoin.pointInInterval(
            points, "d", intervals, "lo", "hi", binWidth = 30)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("d") - col("lo")).as("lag_sum"))
          .orderBy("o_orderkey")
      },
      Some("WITH p AS (SELECT l_orderkey, CAST(CAST(l_shipdate AS DATE) - " +
        "DATE '1970-01-01' AS BIGINT) AS d FROM lineitem " +
        "WHERE l_orderkey % 37 = 0), " +
        "i AS (SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) - " +
        "DATE '1970-01-01' AS BIGINT) AS lo FROM orders " +
        "WHERE o_orderkey % 331 = 0) " +
        "SELECT o_orderkey, count(*) AS n, " +
        "CAST(sum(d - lo) AS BIGINT) AS lag_sum " +
        "FROM p JOIN i ON p.d BETWEEN i.lo AND i.lo + 60 " +
        "GROUP BY 1 ORDER BY 1")),

    Q("j23_interval_overlap",
      // interval × interval overlap join (RangeJoin.intervalOverlap,
      // 14-day bins): per-supplier shipment windows [shipdate,
      // shipdate + qty%14 days] that overlap — the symmetric
      // generalization of j18, with the canonical-bin guard emitting
      // each pair exactly once (no distinct pass; scaladoc proof).
      // The supplier partition key is what bounds the pair count —
      // the per-entity form every downtime/session-overlap workload
      // takes. Oracle = DuckDB's native inequality join.
      (s, dir) => {
        val epoch = lit("1970-01-01").cast("date")
        val iv = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= "1995-01-01" &&
            col("l_shipdate") < "1995-07-01")
          .select(col("l_suppkey").as("s"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
            datediff(to_date(col("l_shipdate")), epoch).cast("long").as("lo"),
            (datediff(to_date(col("l_shipdate")), epoch).cast("long") +
              col("l_quantity").cast("long") % 14).as("hi"))
        val a = iv.select(col("s"), col("id").as("id_a"),
          col("lo").as("lo_a"), col("hi").as("hi_a"))
        val b = iv.select(col("s"), col("id").as("id_b"),
          col("lo").as("lo_b"), col("hi").as("hi_b"))
        graft.ops.RangeJoin.intervalOverlap(a, "lo_a", "hi_a",
            b, "lo_b", "hi_b", binWidth = 14, partitionKeys = Seq("s"))
          .filter(col("id_a") < col("id_b"))
          .select(col("s"), col("id_a"), col("id_b"),
            (least(col("hi_a"), col("hi_b")) -
              greatest(col("lo_a"), col("lo_b")) + 1).as("ov_days"))
          .orderBy("s", "id_a", "id_b")
      },
      Some("WITH iv AS (SELECT l_suppkey AS s, " +
        "l_orderkey * 10 + l_linenumber AS id, " +
        "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS lo, " +
        "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) + " +
        "CAST(l_quantity AS BIGINT) % 14 AS hi FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01' " +
        "AND l_shipdate < TIMESTAMP '1995-07-01') " +
        "SELECT a.s AS s, a.id AS id_a, b.id AS id_b, " +
        "least(a.hi, b.hi) - greatest(a.lo, b.lo) + 1 AS ov_days " +
        "FROM iv a JOIN iv b ON a.s = b.s AND a.lo <= b.hi " +
        "AND b.lo <= a.hi AND a.id < b.id " +
        "ORDER BY s, id_a, id_b")),

    Q("j24_stats_broadcast",
      // metadata-driven join strategy (Layout.readForJoin): the dim
      // side is a snapshot-logged Layout table whose EXACT live row
      // count comes from the manifest (countFast — no data file
      // opened), and under the broadcast ceiling the read carries a
      // broadcast hint. The gate DISABLES Spark's size-based auto
      // broadcast and hard-asserts the plan still builds a
      // BroadcastHashJoin — proving the catalog's stats, not the
      // planner's file-size guess, made the call. At 100 TB this is
      // the shuffle-the-fact vs broadcast-the-dim decision.
      (s, dir) => {
        val path = System.getProperty("java.io.tmpdir") +
          "/graft_statsb_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        if (graft.catalog.SnapshotManifest.currentSnap(s, path).isEmpty) {
          fs.delete(new org.apache.hadoop.fs.Path(path), true)
          graft.catalog.Layout.appendClusteredZoned(
            t(s, dir, "supplier").select(col("s_suppkey"),
              col("s_name"), col("s_nationkey")),
            path, "s_name", "s_suppkey", numBuckets = 4, filesPerBucket = 1)
        }
        val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val dim = graft.catalog.Layout.readForJoin(
            s, path, "s_name", "s_suppkey", numBuckets = 4)
          val fact = t(s, dir, "lineitem")
          val df = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"))
            .groupBy(col("s_nationkey"))
            .agg(count(lit(1)).as("n"),
              sum(col("l_quantity").cast("decimal(18,2)"))
                .cast("double").as("sum_qty"))
            .orderBy("s_nationkey")
          // force planning NOW, while auto-broadcast is off
          require(df.queryExecution.executedPlan.toString
              .contains("BroadcastHashJoin"),
            "stats-driven broadcast hint did not reach the plan")
          df
        } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      },
      Some("SELECT s_nationkey, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY 1 ORDER BY 1")),

    Q("u3_upsert",
      // INSERT … ON CONFLICT DO UPDATE (lists.js:483-491,
      // portfolio.js:427-445) via the upsert kernel: updated rows win,
      // brand-new key appended
      (s, dir) => {
        import s.implicits._
        val target = t(s, dir, "part")
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        val src = t(s, dir, "part").filter(col("p_size") > 40)
          .select(col("p_partkey"), col("p_name"),
            round(col("p_retailprice") * 2, 2).as("p_retailprice"))
          .union(Seq((999999L, "graft#new", 1.23)).toDF("p_partkey", "p_name", "p_retailprice"))
        Kernels.upsert(target, src, Seq("p_partkey")).orderBy("p_partkey")
      },
      Some("SELECT p_partkey, p_name, p_retailprice FROM (" +
        "SELECT p_partkey, p_name, CASE WHEN p_size > 40 THEN round(p_retailprice * 2, 2) " +
        "ELSE p_retailprice END AS p_retailprice FROM part " +
        "UNION ALL SELECT 999999, 'graft#new', 1.23) ORDER BY p_partkey")),

    Q("u8_cascade_delete",
      // FK cascade delete (schema.sql:43,53,59; lists.js:138): delete
      // region 0 → nations cascade → customers cascade
      (s, dir) => {
        val doomedNations = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_regionkey") === 0)
            .select(col("r_regionkey").as("n_regionkey"))), Seq("n_regionkey"), "left_semi")
          .select(col("n_nationkey").as("c_nationkey"))
        Kernels.cowDelete(t(s, dir, "customer"), doomedNations, Seq("c_nationkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_nationkey")
      },
      Some("SELECT c_nationkey, count(*) AS n_customers FROM customer " +
        "WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0) " +
        "GROUP BY c_nationkey ORDER BY c_nationkey")),

    Q("set_intersect",
      // §2.7: set semantics (Spark intersect == SQL INTERSECT distinct)
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY o_custkey")),

    Q("set_except",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
          .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY o_custkey")),

    Q("scalar_exprs",
      // §2.8 scalar surface: upper, coalesce/nullif, least/greatest,
      // CASE WHEN, round, extract, concat, printf-format, date_add
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          upper(col("o_orderpriority")).as("pri_upper"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_norm"),
          least(col("o_totalprice"), lit(150000.0)).as("capped"),
          greatest(col("o_totalprice"), lit(1000.0)).as("floored"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          // plain IEEE double division, NO rounding: round(x/1000, 2)
          // lands on exact .xx5 halves where Spark (decimal-string
          // HALF_UP) and DuckDB (binary) disagree, and decimal
          // division is exact in Spark but binary in DuckDB
          (col("o_totalprice") / 1000.0).as("k_price"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"),
          concat(lit("O-"), col("o_orderkey").cast("string")).as("tag"),
          format_string("%s#%04d", col("o_orderstatus"),
            pmod(col("o_custkey"), lit(1000))).as("fmt"),
          date_add(to_date(col("o_orderdate")), 30).as("due_day"),
          col("o_totalprice").between(50000, 100000).as("in_band"))
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, upper(o_orderpriority) AS pri_upper, " +
        "coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm, " +
        "least(o_totalprice, 150000.0) AS capped, " +
        "greatest(o_totalprice, 1000.0) AS floored, " +
        "CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 100000 " +
        "THEN 'mid' ELSE 'small' END AS bucket, " +
        "o_totalprice / 1000 AS k_price, " +
        "CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year, " +
        "CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month, " +
        "concat('O-', CAST(o_orderkey AS VARCHAR)) AS tag, " +
        "printf('%s#%04d', o_orderstatus, o_custkey % 1000) AS fmt, " +
        "CAST(o_orderdate AS DATE) + 30 AS due_day, " +
        "o_totalprice BETWEEN 50000 AND 100000 AS in_band " +
        "FROM orders ORDER BY o_orderkey")),

    Q("s18_json_extract",
      // semi-structured surface: schema'd from_json over the event
      // payload column, extracted field used in aggregates — the
      // codegen'd path (a typed struct projection inside the scan
      // stage), not per-row string re-parsing downstream. BIGINT sums
      // via the DuckDB HUGEINT cast convention.
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
        .orderBy("event_type"),
      Some("SELECT event_type, count(*) AS n, " +
        "min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k, " +
        "max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k, " +
        "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k " +
        "FROM events GROUP BY 1 ORDER BY 1")),

    Q("array_exprs",
      // §2.8 companion: the ARRAY surface — higher-order transform /
      // filter / aggregate lambdas, sort, join, containment, max —
      // codegen-planned per row, no explode/shuffle (the same per-row
      // array discipline as t10's repetition metrics). The array is
      // derived arithmetically so both engines build bit-identical
      // inputs (no tokenizer-parity dependence).
      (s, dir) => {
        val arr = array(col("doc_id") % 7, col("doc_id") % 11,
          col("doc_id") % 13)
        t(s, dir, "documents").select(col("doc_id"),
            arr.as("arr"))
          .select(col("doc_id"),
            aggregate(transform(col("arr"), x => x * 2 + 1),
              lit(0L), (acc, x) => acc + x).as("t_sum"),
            size(filter(col("arr"), x => x % 2 === 0)).cast("long").as("n_even"),
            array_join(sort_array(col("arr")), ",").as("sorted_csv"),
            array_contains(col("arr"), 5L).as("has5"),
            array_max(col("arr")).as("mx"))
          .orderBy("doc_id")
      },
      Some("WITH a AS (SELECT doc_id, [doc_id % 7, doc_id % 11, doc_id % 13] " +
        "AS arr FROM documents) " +
        "SELECT doc_id, " +
        "CAST(list_sum(list_transform(arr, x -> x * 2 + 1)) AS BIGINT) AS t_sum, " +
        "len(list_filter(arr, x -> x % 2 = 0)) AS n_even, " +
        "array_to_string(list_sort(arr), ',') AS sorted_csv, " +
        "list_contains(arr, 5) AS has5, list_max(arr) AS mx " +
        "FROM a ORDER BY doc_id")),

    Q("a35_unpivot",
      // wide→long UNPIVOT (melt) through the native Dataset.unpivot —
      // the inverse of a16's pivot; value columns coerced to one type
      // as the relational melt requires. Exact DECIMAL sums surfaced
      // as DOUBLE (the st1 money convention).
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          count(lit(1)).cast("double").as("n"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n")),
          "metric", "value")
        .orderBy("l_returnflag", "metric"),
      Some("WITH s AS (SELECT l_returnflag, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, " +
        "CAST(count(*) AS DOUBLE) AS n FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, metric, value FROM (" +
        "SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM s " +
        "UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM s " +
        "UNION ALL SELECT l_returnflag, 'n', n FROM s) " +
        "ORDER BY l_returnflag, metric")),

    Q("o5_tail_resort",
      // app-side tail-k + reverse (chart.js:25-26, portfolio.js:514)
      // pushed into the engine: DESC limit, then re-sort ASC
      (s, dir) => {
        val daily = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "A")
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(max(col("l_extendedprice")).as("close"))
        daily.orderBy(col("day").desc).limit(60).orderBy("day")
      },
      Some("SELECT day, close FROM (SELECT CAST(l_shipdate AS DATE) AS day, " +
        "max(l_extendedprice) AS close FROM lineitem WHERE l_returnflag = 'A' " +
        "GROUP BY 1 ORDER BY day DESC LIMIT 60) ORDER BY day")),

    Q("w4_running_balance",
      // ledger statement with running balance (portfolio.js:253-257 +
      // running-sum window; exact DECIMAL accumulation)
      (s, dir) => Ledger.statement(t(s, dir, "events"), "user_id", col("value"),
          Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id"),
          col("running_balance").cast("double").as("running_balance"))
        .orderBy("user_id", "event_id"),
      Some("SELECT user_id, event_id, CAST(sum(CAST(value AS DECIMAL(18,2))) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_balance " +
        "FROM events ORDER BY user_id, event_id")),

    Q("m2_visibility",
      // public/shared/private tagging (lists.js:201-220) via
      // Acl.withVisibility
      (s, dir) => {
        val lists = t(s, dir, "customer")
          .select(col("c_custkey").as("listid"),
            (col("c_mktsegment") === "BUILDING").as("is_public"))
        val shares = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("listid"))
        Acl.withVisibility(lists, shares)
          .select(col("listid"), col("visibility"))
          .orderBy("listid")
      },
      Some("SELECT c_custkey AS listid, CASE WHEN c_mktsegment = 'BUILDING' THEN 'public' " +
        "WHEN EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT') THEN 'shared' ELSE 'private' END AS visibility " +
        "FROM customer ORDER BY listid")),

    Q("m3_visible_reviews",
      // row-level review visibility (reviews.js:243-251) pushed
      // in-plan via Acl.visibleReviews
      (s, dir) => {
        val reviews = t(s, dir, "orders")
          .select(col("o_orderkey").as("review_id"),
            pmod(col("o_orderkey"), lit(100)).as("listid"),
            col("o_custkey").as("userid"))
        val lists = t(s, dir, "customer")
          .select(col("c_custkey").as("listid"),
            pmod(col("c_custkey"), lit(50)).as("ownerid"),
            (col("c_mktsegment") === "AUTOMOBILE").as("is_public"))
        Acl.visibleReviews(reviews, lists, lit(7))
          .select(col("review_id"), col("listid"), col("userid"))
          .orderBy("review_id")
      },
      Some("SELECT o_orderkey AS review_id, o_orderkey % 100 AS listid, " +
        "o_custkey AS userid FROM orders JOIN customer ON o_orderkey % 100 = c_custkey " +
        "WHERE c_mktsegment = 'AUTOMOBILE' OR o_custkey = 7 OR c_custkey % 50 = 7 " +
        "ORDER BY review_id")),

    Q("m5_state_machine",
      // friend-request guards (users.js:301-350) via
      // Social.validateRequests: self / already-friends / dup-pending
      (s, dir) => {
        val ev = t(s, dir, "events")
        val requests = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("requestid"), col("user_id").as("fromuserid"),
            pmod(col("event_id"), lit(50)).as("touserid"))
        val pending = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("fromuserid"),
            pmod(col("event_id"), lit(50)).as("touserid"),
            lit(Social.Pending).as("status"))
        val edges = Kernels.normalizeEdge(
          ev.filter(col("event_type") === "signup")
            .select(col("user_id").as("a"), pmod(col("event_id"), lit(50)).as("b")),
          "a", "b").distinct()
        Social.validateRequests(requests, pending, edges)
          .select(col("requestid"), col("fromuserid"), col("touserid"), col("verdict"))
          .orderBy("requestid")
      },
      Some("WITH req AS (SELECT event_id AS requestid, user_id AS fromuserid, " +
        "event_id % 50 AS touserid FROM events WHERE event_type = 'purchase'), " +
        "pend AS (SELECT DISTINCT least(user_id, event_id % 50) AS u1, " +
        "greatest(user_id, event_id % 50) AS u2 FROM events WHERE event_type = 'view'), " +
        "fr AS (SELECT DISTINCT least(user_id, event_id % 50) AS u1, " +
        "greatest(user_id, event_id % 50) AS u2 FROM events WHERE event_type = 'signup') " +
        "SELECT requestid, fromuserid, touserid, " +
        "CASE WHEN fromuserid = touserid THEN 'REJECT_SELF' " +
        "WHEN EXISTS(SELECT 1 FROM fr WHERE u1 = least(fromuserid, touserid) " +
        "AND u2 = greatest(fromuserid, touserid)) THEN 'REJECT_ALREADY_FRIENDS' " +
        "WHEN EXISTS(SELECT 1 FROM pend WHERE u1 = least(fromuserid, touserid) " +
        "AND u2 = greatest(fromuserid, touserid)) THEN 'REJECT_DUPLICATE_PENDING' " +
        "ELSE 'ACCEPT' END AS verdict FROM req ORDER BY requestid")),
  )
}
