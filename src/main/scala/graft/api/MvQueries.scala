package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.catalog.Tables
import graft.plans.{DistinctElim, FkCatalog, JoinElim, Mv, MvCatalog, PkCatalog}

/** Materialized-view rewrite gates (SURVEY §2.11): an aggregate query
  * written against the BASE fact table is transparently re-pointed at
  * a pre-aggregated summary parquet by the Catalyst rule
  * [[graft.plans.MvRewriteRule]], and must still match the oracle's
  * from-scratch aggregation over the raw table. Each gate hard-asserts
  * the optimized plan actually reads the MV (and not the fact), so a
  * green gate proves rewrite-fired AND answers-match — not just that
  * the un-rewritten plan happened to be correct.
  *
  * The fact table is a session-scoped copy of `lineitem` (the same
  * tmp-dir convention as `s13_compact_echo`), so the registry can
  * never capture another gate's scan. Built at most once per
  * (session, sf-dir); qty is cast to BIGINT (exact cross-engine sums,
  * the a29/st2 HUGEINT lesson baked in) and price to DECIMAL(18,2)
  * (order-independent exact sums, surfaced as DOUBLE). */
object MvQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Build fact+MV once per (applicationId, sf-dir); returns the fact
    * DataFrame. Skip-if-exists keeps repeated gate calls off the
    * FileStatusCache's stale-listing path and makes reruns free. */
  private def factWithMv(s: SparkSession, dir: String): DataFrame = {
    val root = System.getProperty("java.io.tmpdir") + "/graft_mv_" +
      s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
    val factPath = root + "/fact"
    val mvPath = root + "/mv"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(mvPath, "_SUCCESS"))) {
      t(s, dir, "lineitem").select(
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        col("l_quantity").cast("bigint").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
        .write.mode("overwrite").parquet(factPath)
      Mv.build(s.read.parquet(factPath), s"mv_fact_$dir", Seq("rf", "ls"),
        measures = Seq("qty", "price"), mvPath = mvPath,
        mins = Seq("qty"), maxs = Seq("qty"))
    } else if (MvCatalog.forPaths(
        Mv.basePathsOf(s.read.parquet(factPath))).isEmpty) {
      // fresh JVM over a previous run's files: re-register only
      Mv.build(s.read.parquet(factPath), s"mv_fact_$dir", Seq("rf", "ls"),
        measures = Seq("qty", "price"), mvPath = mvPath,
        mins = Seq("qty"), maxs = Seq("qty"))
    }
    Mv.install(s)
    s.read.parquet(factPath)
  }

  /** Root paths of every file scan in the optimized plan — shared by
    * every plan-asserting gate in this file. */
  private[api] def scanRoots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten.toSet

  /** Fail loudly if the optimized plan still reads the fact —
    * a silently-bailed rewrite must not pass as a correct gate. */
  private[api] def assertMvScan(df: DataFrame): DataFrame = {
    val paths = scanRoots(df)
    require(paths.nonEmpty && paths.forall(_.contains("/mv")),
      s"MV rewrite did not fire; scans = $paths")
    df
  }

  private val factSql =
    "fact AS (SELECT l_returnflag AS rf, l_linestatus AS ls, " +
      "CAST(l_quantity AS BIGINT) AS qty, " +
      "CAST(l_extendedprice AS DECIMAL(18,2)) AS price FROM lineitem)"

  val entries: Seq[Q] = Seq(

    Q("mv1_rewrite",
      // rollup to rf + dim residual filter, the five decomposable
      // aggregates in one query; answered entirely from the summary
      (s, dir) => {
        val f = factWithMv(s, dir)
        assertMvScan(f.filter(col("ls") === "F").groupBy("rf").agg(
          sum("qty").as("sum_qty"),
          count(lit(1)).as("n"),
          round(avg("qty"), 4).as("avg_qty"),
          sum("price").cast("double").as("revenue"),
          min("qty").as("min_qty"),
          max("qty").as("max_qty")).orderBy("rf"))
      },
      Some(s"WITH $factSql SELECT rf, CAST(sum(qty) AS BIGINT) AS sum_qty, " +
        "count(*) AS n, round(CAST(sum(qty) AS DOUBLE) / count(qty), 4) AS avg_qty, " +
        "CAST(sum(price) AS DOUBLE) AS revenue, min(qty) AS min_qty, " +
        "max(qty) AS max_qty FROM fact WHERE ls = 'F' GROUP BY rf ORDER BY rf")),

    Q("mv2_mv_rollup",
      // rollup to the OTHER dim subset, no filter — partials
      // re-aggregate across the collapsed rf axis
      (s, dir) => {
        val f = factWithMv(s, dir)
        assertMvScan(f.groupBy("ls").agg(
          count(col("qty")).as("n_qty"),
          sum("qty").as("sum_qty"),
          // COUNT(DISTINCT dim): distinct combos are preserved exactly
          // in the summary, so even this answers without the fact
          countDistinct(col("rf")).as("n_rf"),
          sum("price").cast("double").as("revenue")).orderBy("ls"))
      },
      Some(s"WITH $factSql SELECT ls, count(qty) AS n_qty, " +
        "CAST(sum(qty) AS BIGINT) AS sum_qty, " +
        "count(DISTINCT rf) AS n_rf, " +
        "CAST(sum(price) AS DOUBLE) AS revenue " +
        "FROM fact GROUP BY ls ORDER BY ls")),

    Q("mv3_mv_refresh",
      // incremental append-refresh: the summary is built over 3/4 of
      // the fact, the remaining quarter folds in via refreshAppend
      // (O(batch+MV), copy-on-write re-point) — then a query over the
      // FULL fact must answer from the refreshed summary alone
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv3_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv3_" + Integer.toHexString(root.hashCode)
        val factPath = root + "/fact"
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "lineitem").select(
            col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
            col("l_orderkey").as("ok"),
            col("l_quantity").cast("bigint").as("qty"),
            col("l_extendedprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(factPath)
          val full = s.read.parquet(factPath)
          Mv.build(full.filter(col("ok") % 4 =!= 0), name, Seq("rf", "ls"),
            measures = Seq("qty", "price"), mvPath = root + "/mv",
            mins = Seq("qty"), maxs = Seq("qty"))
          Mv.refreshAppend(s, name, full.filter(col("ok") % 4 === 0))
        }
        Mv.install(s)
        assertMvScan(s.read.parquet(factPath)
          .filter(col("ls") === "O").groupBy("rf").agg(
            sum("qty").as("sum_qty"),
            count(lit(1)).as("n"),
            sum("price").cast("double").as("revenue"),
            min("qty").as("min_qty"),
            max("qty").as("max_qty")).orderBy("rf"))
      },
      Some(s"WITH $factSql SELECT rf, CAST(sum(qty) AS BIGINT) AS sum_qty, " +
        "count(*) AS n, CAST(sum(price) AS DOUBLE) AS revenue, " +
        "min(qty) AS min_qty, max(qty) AS max_qty " +
        "FROM fact WHERE ls = 'O' GROUP BY rf ORDER BY rf")),

    Q("mv6_mv_cdc_refresh",
      // RETRACTABLE CDC refresh: the summary is built over the fact at
      // T0; a change window then DELETES every ok%5 row and INSERTS a
      // copy of every ok%7 row. The feed folds into the summary via
      // refreshChanges — one signed delta aggregation + one MV-sized
      // merge, O(|feed|+|MV|), the fact is never re-read — and the base
      // advances in place to the same net state. A query over the
      // CHANGED base must then answer from the refreshed summary alone
      // (hard-asserted); the oracle recomputes from scratch over the
      // same net multiset. Measures are BIGINT + DECIMAL, so the
      // retraction is exact, not float-approximate.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv6_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv6_" + Integer.toHexString(root.hashCode)
        val factPath = root + "/fact"
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "lineitem").select(
            col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
            col("l_orderkey").as("ok"),
            col("l_quantity").cast("bigint").as("qty"),
            col("l_extendedprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(factPath)
          val v0 = s.read.parquet(factPath)
          Mv.build(v0, name, Seq("rf", "ls"),
            measures = Seq("qty", "price"), mvPath = root + "/mv")
          // materialize the window's feed BEFORE the base advances —
          // a lazy feed re-read after the swap would see T1, the
          // classic read-your-own-writes CDC footgun
          v0.filter(col("ok") % 5 === 0)
            .withColumn("_change_type", lit("delete"))
            .unionByName(v0.filter(col("ok") % 7 === 0)
              .withColumn("_change_type", lit("insert")))
            .write.parquet(root + "/feed")
          // base → T1 at the SAME path (same table identity the MV is
          // registered under), via write-aside + atomic rename
          v0.filter(col("ok") % 5 =!= 0)
            .unionByName(v0.filter(col("ok") % 7 === 0))
            .write.parquet(root + "/fact_next")
          fs.delete(new org.apache.hadoop.fs.Path(factPath), true)
          require(fs.rename(new org.apache.hadoop.fs.Path(root + "/fact_next"),
            new org.apache.hadoop.fs.Path(factPath)), "fact swap failed")
          Mv.refreshChanges(s, name, s.read.parquet(root + "/feed"))
        }
        Mv.install(s)
        assertMvScan(s.read.parquet(factPath)
          .filter(col("ls") === "F").groupBy("rf").agg(
            sum("qty").as("sum_qty"),
            count(lit(1)).as("n"),
            count(col("price")).as("n_price"),
            round(avg("qty"), 4).as("avg_qty"),
            sum("price").cast("double").as("revenue")).orderBy("rf"))
      },
      Some("WITH fact AS (SELECT l_returnflag AS rf, l_linestatus AS ls, " +
        "l_orderkey AS ok, CAST(l_quantity AS BIGINT) AS qty, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS price FROM lineitem), " +
        "v1 AS (SELECT * FROM fact WHERE ok % 5 <> 0 " +
        "UNION ALL SELECT * FROM fact WHERE ok % 7 = 0) " +
        "SELECT rf, CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n, " +
        "count(price) AS n_price, " +
        "round(CAST(sum(qty) AS DOUBLE) / count(qty), 4) AS avg_qty, " +
        "CAST(sum(price) AS DOUBLE) AS revenue " +
        "FROM v1 WHERE ls = 'F' GROUP BY rf ORDER BY rf")),

    Q("mv5_mv_rollup_sets",
      // ROLLUP answered from the summary: the Aggregate→Expand plan is
      // rebuilt over MV partials (dim slots mirror attr-or-null per
      // grouping set, gid literals copy verbatim) — subtotal and
      // grand-total rows come out of the summary, never the fact
      (s, dir) => {
        val f = factWithMv(s, dir)
        assertMvScan(f.rollup("rf", "ls").agg(
          sum("qty").as("sum_qty"),
          count(lit(1)).as("n"),
          sum("price").cast("double").as("revenue"))
          .orderBy(col("rf").asc_nulls_first, col("ls").asc_nulls_first))
      },
      Some(s"WITH $factSql SELECT rf, ls, " +
        "CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n, " +
        "CAST(sum(price) AS DOUBLE) AS revenue FROM fact " +
        "GROUP BY ROLLUP (rf, ls) " +
        "ORDER BY rf NULLS FIRST, ls NULLS FIRST")),

    Q("mv4_mv_star",
      // star-schema MV: the summary is built over orders ⋈ customer;
      // a query that re-joins the two tables, filters a fact dim, and
      // rolls up to a CUSTOMER attribute is answered from the summary
      // alone — neither base table is scanned (hard-asserted)
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv4_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv4_" + Integer.toHexString(root.hashCode)
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(root + "/sfact")
          t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
            .write.mode("overwrite").parquet(root + "/sdim")
          Mv.buildJoin(s.read.parquet(root + "/sfact"),
            s.read.parquet(root + "/sdim"), name, on = Seq("ck" -> "ck2"),
            dims = Seq("seg", "status"), measures = Seq("price"),
            mvPath = root + "/mv")
        }
        Mv.install(s)
        assertMvScan(s.read.parquet(root + "/sfact")
          .join(s.read.parquet(root + "/sdim"),
            col("ck") === col("ck2"), "inner")
          .filter(col("status") === "F")
          .groupBy("seg").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("seg"))
      },
      Some("WITH sfact AS (SELECT o_custkey AS ck, o_orderstatus AS status, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders), " +
        "sdim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT seg, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM sfact JOIN sdim ON ck = ck2 WHERE status = 'F' " +
        "GROUP BY seg ORDER BY seg")),

    Q("j22_join_elim",
      // FK-verified join elimination: the query joins orders→customer
      // by rote but consumes only fact columns; with the FK declared
      // AND audited, the optimizer drops the customer scan and the
      // join entirely (hard-asserted) — the oracle still pays the join
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_je_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "je_" + Integer.toHexString(root.hashCode)
        if (FkCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(root + "/child")
          t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
            .write.mode("overwrite").parquet(root + "/dim")
          JoinElim.declareVerified(name,
            s.read.parquet(root + "/child"), Seq("ck"),
            s.read.parquet(root + "/dim"), Seq("ck2"))
        }
        JoinElim.install(s)
        val df = s.read.parquet(root + "/child")
          .join(s.read.parquet(root + "/dim"),
            col("ck") === col("ck2"), "inner")
          .groupBy("status").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("status")
        val scans = df.queryExecution.optimizedPlan.collect {
          case lr: LogicalRelation => lr.relation match {
            case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
        }.flatten.toSet
        require(!scans.exists(_.endsWith("/dim")) &&
          scans.exists(_.endsWith("/child")),
          s"join elimination did not fire; scans = $scans")
        df
      },
      Some("WITH child AS (SELECT o_custkey AS ck, o_orderstatus AS status, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders), " +
        "dim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT status, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM child JOIN dim ON ck = ck2 GROUP BY status ORDER BY status")),

    Q("s31_agg_elim",
      // AGGREGATE ELIMINATION ON A UNIQUE KEY: GROUP BY the verified
      // PK makes every group exactly one row, so the hash aggregate
      // and its whole shuffle collapse to a Project — sum/avg become
      // casts, min/max/first the column itself, count(*) the literal
      // 1 (hard-asserted: no Aggregate in the optimized plan). The
      // oracle pays the real aggregation.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_ae_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "ae_" + Integer.toHexString(root.hashCode)
        if (PkCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_orderkey").as("ok"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(root + "/t")
          DistinctElim.declareUniqueKey(name,
            s.read.parquet(root + "/t"), Seq("ok"))
        }
        DistinctElim.install(s)
        val df = s.read.parquet(root + "/t").groupBy("ok").agg(
          sum("price").cast("double").as("revenue"),
          count(lit(1)).as("n"),
          max(col("status")).as("st")).orderBy("ok")
        require(!df.queryExecution.optimizedPlan.toString.contains("Aggregate"),
          "aggregate elimination did not fire:\n" +
            df.queryExecution.optimizedPlan)
        df
      },
      Some("WITH t AS (SELECT o_orderkey AS ok, o_orderstatus AS status, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders) " +
        "SELECT ok, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n, " +
        "max(status) AS st FROM t GROUP BY ok ORDER BY ok")),

    Q("j27_semi_anti_elim",
      // SEMI-JOIN ELIMINATION ON A VERIFIED FK: `WHERE EXISTS (SELECT 1
      // FROM dim WHERE pk = fk)` — the BI existence probe — reduces to
      // Filter(fk IS NOT NULL, fact): the FK audit proves every
      // non-null key matches, so the dim scan, its broadcast, and the
      // semi join all vanish (hard-asserted). The fact carries a
      // NULL-keyed row the EXISTS must drop; the oracle pays the real
      // probe.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_sa_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "sa_" + Integer.toHexString(root.hashCode)
        if (FkCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .unionByName(s.range(1).select(
              lit(null).cast("bigint").as("ck"), lit("X").as("status"),
              lit("5.00").cast("decimal(18,2)").as("price")))
            .write.mode("overwrite").parquet(root + "/child")
          t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
            .write.mode("overwrite").parquet(root + "/dim")
          JoinElim.declareVerified(name,
            s.read.parquet(root + "/child"), Seq("ck"),
            s.read.parquet(root + "/dim"), Seq("ck2"))
        }
        JoinElim.install(s)
        val df = s.read.parquet(root + "/child")
          .join(s.read.parquet(root + "/dim"),
            col("ck") === col("ck2"), "left_semi")
          .groupBy("status").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("status")
        val scans = scanRoots(df)
        require(!scans.exists(_.endsWith("/dim")) &&
          scans.exists(_.endsWith("/child")),
          s"semi-join elimination did not fire; scans = $scans")
        df
      },
      Some("WITH child AS (SELECT o_custkey AS ck, o_orderstatus AS status, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders " +
        "UNION ALL SELECT NULL, 'X', CAST(5.00 AS DECIMAL(18,2))), " +
        "dim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT status, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM child WHERE EXISTS (SELECT 1 FROM dim WHERE ck2 = ck) " +
        "GROUP BY status ORDER BY status")),

    Q("j26_outer_join_elim",
      // PK-only OUTER-join elimination: the query LEFT-joins the fact
      // to a dim "just in case" but consumes only fact columns; with
      // the dim key declared (and audited) UNIQUE the join is the
      // identity on the fact — every row emits exactly once whether
      // matched, orphaned, or NULL-keyed — so the optimizer drops the
      // dim scan and the join entirely (hard-asserted), with no FK
      // audit and no IsNotNull filter. The fact deliberately carries a
      // NULL-keyed row and an orphan row; the oracle pays the real
      // left join over the same rows.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_oj_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "oj_" + Integer.toHexString(root.hashCode)
        if (PkCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .unionByName(s.range(1).select(
              lit(null).cast("bigint").as("ck"), lit("X").as("status"),
              lit("1.00").cast("decimal(18,2)").as("price")))
            .unionByName(s.range(1).select(
              lit(-42L).as("ck"), lit("X").as("status"),
              lit("2.00").cast("decimal(18,2)").as("price")))
            .write.mode("overwrite").parquet(root + "/child")
          t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
            .write.mode("overwrite").parquet(root + "/dim")
          DistinctElim.declareUniqueKey(name,
            s.read.parquet(root + "/dim"), Seq("ck2"))
        }
        JoinElim.install(s)
        val df = s.read.parquet(root + "/child")
          .join(s.read.parquet(root + "/dim"),
            col("ck") === col("ck2"), "left")
          .groupBy("status").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("status")
        val scans = scanRoots(df)
        require(!scans.exists(_.endsWith("/dim")) &&
          scans.exists(_.endsWith("/child")),
          s"outer-join elimination did not fire; scans = $scans")
        df
      },
      Some("WITH child AS (SELECT o_custkey AS ck, o_orderstatus AS status, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders " +
        "UNION ALL SELECT NULL, 'X', CAST(1.00 AS DECIMAL(18,2)) " +
        "UNION ALL SELECT -42, 'X', CAST(2.00 AS DECIMAL(18,2))), " +
        "dim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT status, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM child LEFT JOIN dim ON ck = ck2 GROUP BY status ORDER BY status")),

    Q("mv14_distinct_bitmap",
      // EXACT COUNT(DISTINCT measure) from the MV: the summary stores
      // a mergeable value BITMAP per (rf, ls) group for ok/sk; a query
      // rolling up to rf alone OR-merges the groups' bitmaps and reads
      // cardinality — exact even though the SAME order/supplier keys
      // occur under both ls values (summed per-group distinct counts
      // would double-count; HLL would approximate). The summary is
      // built over the odd-linenumber half and the even half folds in
      // via refreshAppend, whose bitmap OR-merge must count keys
      // present in BOTH halves exactly once. Hard-asserts the fact is
      // never scanned; the oracle recomputes from the raw rows.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv14_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv14_" + Integer.toHexString(root.hashCode)
        val factPath = root + "/fact"
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "lineitem").select(
            col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
            col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
            col("l_linenumber").as("ln"),
            col("l_quantity").cast("bigint").as("qty"))
            .write.mode("overwrite").parquet(factPath)
          val full = s.read.parquet(factPath)
          Mv.build(full.filter(col("ln") % 2 === 1), name, Seq("rf", "ls"),
            measures = Seq("qty"), mvPath = root + "/mv",
            distincts = Seq("ok", "sk"))
          Mv.refreshAppend(s, name, full.filter(col("ln") % 2 === 0))
        }
        Mv.install(s)
        // ONE distinct aggregate per query: Spark's logical
        // RewriteDistinctAggregates mangles multi-distinct plans into
        // an Expand before user rules run; a single distinct stays a
        // plain Aggregate (planned via AggUtils at physical) and
        // rewrites — sk stays bitmap-tracked for its own queries
        assertMvScan(s.read.parquet(factPath).groupBy("rf").agg(
          countDistinct(col("ok")).as("n_ok"),
          sum("qty").as("sum_qty"),
          count(lit(1)).as("n")).orderBy("rf"))
      },
      Some("WITH fact AS (SELECT l_returnflag AS rf, l_orderkey AS ok, " +
        "CAST(l_quantity AS BIGINT) AS qty FROM lineitem) " +
        "SELECT rf, count(DISTINCT ok) AS n_ok, " +
        "CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n " +
        "FROM fact GROUP BY rf ORDER BY rf")),

    Q("mv15_filtered_mv",
      // FILTERED (partial) MV — the Oracle/Calcite partial-MV class:
      // the summary is declared WITH a predicate (`ls = 'F'`), holds
      // only that slice, and the filter column is NOT a dim — the
      // view is strictly smaller than any full summary could be. A
      // query whose filters SUBSUME the predicate (canonical-conjunct
      // containment) answers from it, with the subsumed conjuncts
      // dropped (already applied at build) and the extra dim filter
      // evaluated against the summary. Hard-asserts the fact is never
      // scanned; the oracle recomputes from the raw rows.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv15_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv15_" + Integer.toHexString(root.hashCode)
        val factPath = root + "/fact"
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "lineitem").select(
            col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
            col("l_linenumber").as("ln"),
            col("l_quantity").cast("bigint").as("qty"),
            col("l_extendedprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(factPath)
          Mv.build(s.read.parquet(factPath), name, Seq("rf", "ln"),
            measures = Seq("qty", "price"), mvPath = root + "/mv",
            where = Some("ls = 'F'"))
        }
        Mv.install(s)
        assertMvScan(s.read.parquet(factPath)
          .filter(col("ls") === "F" && col("ln") <= 4)
          .groupBy("rf").agg(
            sum("qty").as("sum_qty"),
            count(lit(1)).as("n"),
            sum("price").cast("double").as("revenue")).orderBy("rf"))
      },
      Some("WITH fact AS (SELECT l_returnflag AS rf, l_linestatus AS ls, " +
        "l_linenumber AS ln, CAST(l_quantity AS BIGINT) AS qty, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS price FROM lineitem) " +
        "SELECT rf, CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n, " +
        "CAST(sum(price) AS DOUBLE) AS revenue " +
        "FROM fact WHERE ls = 'F' AND ln <= 4 " +
        "GROUP BY rf ORDER BY rf")),

    Q("mv16_filtered_star",
      // FILTERED STAR MV: the summary covers only the σ(ls='F') slice
      // of fact ⋈ dim, grouped by a DIM-side attribute — the hot-slice
      // cube (current-period sales by customer segment). A re-joining
      // query whose filters subsume the predicate answers with zero
      // joins and zero fact I/O (hard-asserted); the oracle pays the
      // real join over the raw rows.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv16_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv16_" + Integer.toHexString(root.hashCode)
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "lineitem").select(
            col("l_orderkey").as("okey"), col("l_linestatus").as("ls"),
            col("l_quantity").cast("bigint").as("qty"))
            .write.mode("overwrite").parquet(root + "/fact")
          t(s, dir, "orders").select(
            col("o_orderkey").as("rok"), col("o_orderstatus").as("status"))
            .write.mode("overwrite").parquet(root + "/dim")
          Mv.buildStar(s.read.parquet(root + "/fact"),
            Seq(s.read.parquet(root + "/dim") -> Seq(("okey", "rok"))),
            name, Seq("status"), measures = Seq("qty"),
            mvPath = root + "/mv", where = Some("ls = 'F'"))
        }
        Mv.install(s)
        assertMvScan(s.read.parquet(root + "/fact")
          .join(s.read.parquet(root + "/dim"),
            col("okey") === col("rok"), "inner")
          .filter(col("ls") === "F")
          .groupBy("status").agg(
            sum("qty").as("sum_qty"),
            count(lit(1)).as("n")).orderBy("status"))
      },
      Some("WITH fact AS (SELECT l_orderkey AS okey, l_linestatus AS ls, " +
        "CAST(l_quantity AS BIGINT) AS qty FROM lineitem), " +
        "dim AS (SELECT o_orderkey AS rok, o_orderstatus AS status FROM orders) " +
        "SELECT status, CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n " +
        "FROM fact JOIN dim ON okey = rok WHERE ls = 'F' " +
        "GROUP BY status ORDER BY status")),

    Q("mv7_mv_log_refresh",
      // LOG-DRIVEN MV SELF-REFRESH: the summary is built while the
      // snapshot-logged base holds only the pre-1997 orders; a nightly
      // append moves the base, so the staleness guard SUSPENDS the
      // rewrite (hard-asserted — queries fall back to the base scan,
      // fresh but slower). refreshFromLog walks the base's own hop
      // chain — the append window folds in as inserts (O(batch+MV),
      // no base rescan), a dv-only delete restamps free (plain reads
      // do not apply the vectors), and a compact + full vacuum folds
      // the commit's own rw_* change-data part as RETRACTIONS through
      // the counting machinery — copy-on-write re-point + restamp each
      // time, and the rewrite RESUMES answering for the live base
      // (hard-asserted + oracle-checked over the same survivors).
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv7_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv7_" + Integer.toHexString(root.hashCode)
        val baseP = root + "/base"
        def q: DataFrame = s.read.parquet(baseP)
          .groupBy("symbol").agg(
            sum(col("qty")).cast("double").as("sum_qty"),
            count(lit(1)).as("n")).orderBy("symbol")
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          val o = t(s, dir, "orders").select(
            col("o_orderstatus").as("symbol"),
            to_date(col("o_orderdate")).as("ship"),
            col("o_totalprice").cast("decimal(18,2)").as("qty"))
          val cut = lit("1997-01-01").cast("date")
          graft.catalog.Layout.writeClusteredZoned(o.filter(col("ship") < cut),
            baseP, "symbol", "ship", numBuckets = 4, filesPerBucket = 4)
          Mv.build(s.read.parquet(baseP), name, Seq("symbol"),
            measures = Seq("qty"), mvPath = root + "/mv")
          Mv.install(s)
          assertMvScan(q) // rewrite fires at build
          // the nightly append: base moves, stamp no longer matches
          graft.catalog.Layout.appendClusteredZoned(
            o.filter(col("ship") >= cut), baseP, "symbol", "ship",
            numBuckets = 4, filesPerBucket = 4)
          require(scanRoots(q).exists(_.endsWith("/base")),
            "staleness guard should suspend the rewrite after the append")
          // the append window folds in; rewrite resumes
          Mv.refreshFromLog(s, name)
          assertMvScan(q)
          // dv delete: the plain read the rewrite answers for is
          // bit-identical → refreshFromLog restamps without a fold
          graft.catalog.Layout.delete(s, baseP, "ship",
            col("symbol") === "P")
          Mv.refreshFromLog(s, name)
          assertMvScan(q)
          // compact + full vacuum MATERIALIZE the delete out of the
          // plain read; the final refresh below retracts the rw_*
          // provenance rows and the summary answers for the survivors
          graft.catalog.Layout.compact(s, baseP, "symbol", "ship",
            filesPerBucket = 4)
          graft.catalog.Layout.vacuum(s, baseP, retainPrevious = false)
          require(scanRoots(q).exists(_.endsWith("/base")),
            "staleness guard should suspend the rewrite after the compact")
        }
        Mv.install(s)
        // self-heal from the base's own snapshot log; idempotent when
        // nothing moved (second bench pass)
        Mv.refreshFromLog(s, name)
        assertMvScan(q)
      },
      Some("WITH base AS (SELECT o_orderstatus AS symbol, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS qty FROM orders " +
        "WHERE o_orderstatus <> 'P') " +
        "SELECT symbol, CAST(sum(qty) AS DOUBLE) AS sum_qty, " +
        "count(*) AS n FROM base GROUP BY symbol ORDER BY symbol")),

    Q("mv8_star_log_refresh",
      // STAR-MV LOG REFRESH: the summary is built over orders ⋈
      // customer while the snapshot-logged DIM holds only the
      // even-keyed customers; the odd half then lands as a nightly dim
      // append, which SUSPENDS the star rewrite (hard-asserted — this
      // was the r12 gap: short of an O(fact) buildJoin rebuild the
      // suspension was permanent). refreshFromLog walks BOTH bases'
      // snapshot logs, recognizes a dim-only append window, and folds
      // `F₁ ⋈ ΔD` — ONE probe-sided join of the full fact against the
      // batch-sized dim delta (the delta broadcasts; the fact is never
      // re-summarized) — then restamps at the audited snapshots. The
      // rewrite RESUMES answering for the full join (hard-asserted +
      // oracle-checked against the from-scratch join over all rows).
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv8_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv8_" + Integer.toHexString(root.hashCode)
        val factP = root + "/sfact"
        val dimP = root + "/sdim"
        def q: DataFrame = s.read.parquet(factP)
          .join(s.read.parquet(dimP), col("ck") === col("ck2"), "inner")
          .groupBy("seg").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("seg")
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          val o = t(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"),
            col("o_orderkey").as("ok"))
          graft.catalog.Layout.writeClusteredZoned(o, factP,
            "status", "ok", numBuckets = 4, filesPerBucket = 4)
          val c = t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
          graft.catalog.Layout.writeClusteredZoned(
            c.filter(col("ck2") % 2 === 0), dimP,
            "seg", "ck2", numBuckets = 4, filesPerBucket = 4)
          // the zoned tables' sym_bucket bookkeeping column is dropped
          // so the declared frames keep disjoint schemas
          Mv.buildJoin(
            s.read.parquet(factP).select("ck", "status", "price"),
            s.read.parquet(dimP).select("ck2", "seg"),
            name, on = Seq("ck" -> "ck2"),
            dims = Seq("seg", "status"), measures = Seq("price"),
            mvPath = root + "/mv")
          Mv.install(s)
          assertMvScan(q) // star rewrite fires at build
          // the nightly DIM append: half the customers arrive late
          graft.catalog.Layout.appendClusteredZoned(
            c.filter(col("ck2") % 2 === 1), dimP,
            "seg", "ck2", numBuckets = 4, filesPerBucket = 4)
          require(scanRoots(q).exists(_.endsWith("/sfact")),
            "staleness guard should suspend the star rewrite after " +
              "the dim append")
        }
        Mv.install(s)
        // self-heal from the two snapshot logs; idempotent on reruns
        Mv.refreshFromLog(s, name)
        assertMvScan(q)
      },
      Some("WITH sfact AS (SELECT o_custkey AS ck, o_orderstatus AS status, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders), " +
        "sdim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT seg, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM sfact JOIN sdim ON ck = ck2 GROUP BY seg ORDER BY seg")),

    Q("mv9_star_cdc_refresh",
      // STAR-MV RETRACTION REFRESH: CDC deletes land on the FACT of a
      // join summary as DVs (restamp-free for the rewrite — the plain
      // read is unchanged), then a routine compact MATERIALIZES them
      // out of the plain read, which used to suspend the star rewrite
      // permanently short of an O(fact) buildJoin rebuild
      // (hard-asserted). refreshFromLog now folds the compact's rw_*
      // provenance rows through the SIGNED join-delta
      // ΔF⋈D₂ + F₂⋈ΔD − ΔF⋈ΔD (removed fact rows weigh −1; the
      // retraction re-joins them against the pinned dim — one
      // broadcast-sized join, the fact is never re-summarized), and
      // the rewrite RESUMES answering for the surviving join
      // (hard-asserted + oracle-checked against the from-scratch join
      // over the post-delete table).
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv9_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv9_" + Integer.toHexString(root.hashCode)
        val factP = root + "/cfact"
        val dimP = root + "/cdim"
        def q: DataFrame = s.read.parquet(factP)
          .join(s.read.parquet(dimP), col("ck") === col("ck2"), "inner")
          .groupBy("seg").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("seg")
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          val o = t(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"),
            col("o_orderkey").as("ok"))
          graft.catalog.Layout.writeClusteredZoned(o, factP,
            "status", "ok", numBuckets = 4, filesPerBucket = 4)
          val c = t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
          graft.catalog.Layout.writeClusteredZoned(c, dimP,
            "seg", "ck2", numBuckets = 4, filesPerBucket = 4)
          Mv.buildJoin(
            s.read.parquet(factP).select("ck", "status", "price"),
            s.read.parquet(dimP).select("ck2", "seg"),
            name, on = Seq("ck" -> "ck2"),
            dims = Seq("seg", "status"), measures = Seq("price"),
            mvPath = root + "/mv")
          Mv.install(s)
          assertMvScan(q) // star rewrite fires at build
          // the CDC delete arrives as DVs: plain read unchanged, the
          // refresh is a metadata-only restamp
          graft.catalog.Layout.delete(s, factP, "ok",
            col("status") === "F")
          Mv.refreshFromLog(s, name)
          assertMvScan(q)
          // the nightly compact + full vacuum materialize the deletes
          // out of the plain read — the rewrite suspends
          graft.catalog.Layout.compact(s, factP, "status", "ok",
            filesPerBucket = 4)
          graft.catalog.Layout.vacuum(s, factP, retainPrevious = false)
          require(scanRoots(q).exists(_.endsWith("/cfact")),
            "staleness guard should suspend the star rewrite after " +
              "the fact compact")
        }
        Mv.install(s)
        // retract the rw_* provenance through the signed join-delta;
        // idempotent on reruns
        Mv.refreshFromLog(s, name)
        assertMvScan(q)
      },
      Some("WITH cfact AS (SELECT o_custkey AS ck, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders " +
        "WHERE o_orderstatus <> 'F'), " +
        "cdim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT seg, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM cfact JOIN cdim ON ck = ck2 GROUP BY seg ORDER BY seg")),

    Q("mv10_snowflake",
      // MULTI-DIM STAR MV (k dims): the summary pre-joins lineitem ⋈
      // part ⋈ supplier and pre-aggregates by (brand, supplier
      // nation); a 3-WAY-JOIN aggregate query is then answered with
      // ZERO joins and zero fact I/O (hard-asserted — at 100 TB this
      // replaces a fact×part×supplier double shuffle with a summary
      // scan). The snapshot-logged SUPPLIER dim receives a nightly
      // append (its late half), which suspends the rewrite
      // (hard-asserted); refreshFromLog recognizes a one-table
      // append-only window among the THREE hop chains and folds
      // ΔD ⋈ (fact, part pinned) — one delta-probe-sided pass, the
      // 2^k signed terms never materialize — then restamps; the
      // rewrite resumes (hard-asserted + oracle-checked against the
      // from-scratch 3-way join).
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv10_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv10_" + Integer.toHexString(root.hashCode)
        val factP = root + "/nfact"
        val d1P = root + "/npart"
        val d2P = root + "/nsupp"
        def q: DataFrame = s.read.parquet(factP)
          .join(s.read.parquet(d1P), col("pk") === col("pk2"), "inner")
          .join(s.read.parquet(d2P), col("sk") === col("sk2"), "inner")
          .groupBy("brand", "snat").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("brand", "snat")
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          val f = t(s, dir, "lineitem").select(
            col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
            col("l_extendedprice").cast("decimal(18,2)").as("price"),
            col("l_orderkey").as("ok"))
          graft.catalog.Layout.writeClusteredZoned(f, factP,
            "pk", "ok", numBuckets = 4, filesPerBucket = 4)
          val d1 = t(s, dir, "part").select(
            col("p_partkey").as("pk2"), col("p_brand").as("brand"))
          graft.catalog.Layout.writeClusteredZoned(d1, d1P,
            "brand", "pk2", numBuckets = 4, filesPerBucket = 2)
          val d2 = t(s, dir, "supplier").select(
            col("s_suppkey").as("sk2"), col("s_nationkey").as("snat"))
          graft.catalog.Layout.writeClusteredZoned(
            d2.filter(col("sk2") % 2 === 0), d2P,
            "snat", "sk2", numBuckets = 2, filesPerBucket = 2)
          Mv.buildStar(
            s.read.parquet(factP).select("pk", "sk", "price"),
            Seq(s.read.parquet(d1P).select("pk2", "brand")
                -> Seq("pk" -> "pk2"),
              s.read.parquet(d2P).select("sk2", "snat")
                -> Seq("sk" -> "sk2")),
            name, dims = Seq("brand", "snat"), measures = Seq("price"),
            mvPath = root + "/mv")
          Mv.install(s)
          assertMvScan(q) // 3-way star rewrite fires at build
          // the nightly DIM append: the odd suppliers arrive late
          graft.catalog.Layout.appendClusteredZoned(
            d2.filter(col("sk2") % 2 === 1), d2P,
            "snat", "sk2", numBuckets = 2, filesPerBucket = 2)
          require(scanRoots(q).exists(_.endsWith("/nfact")),
            "staleness guard should suspend the snowflake rewrite " +
              "after the supplier append")
        }
        Mv.install(s)
        // heal from the three snapshot logs; idempotent on reruns
        Mv.refreshFromLog(s, name)
        assertMvScan(q)
      },
      Some("WITH nfact AS (SELECT l_partkey AS pk, l_suppkey AS sk, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS price FROM lineitem), " +
        "npart AS (SELECT p_partkey AS pk2, p_brand AS brand FROM part), " +
        "nsupp AS (SELECT s_suppkey AS sk2, s_nationkey AS snat FROM supplier) " +
        "SELECT brand, snat, CAST(sum(price) AS DOUBLE) AS revenue, " +
        "count(*) AS n FROM nfact JOIN npart ON pk = pk2 " +
        "JOIN nsupp ON sk = sk2 GROUP BY brand, snat ORDER BY brand, snat")),

    Q("mv12_star_rollup",
      // ROLLUP over a STAR JOIN answered from the summary: the
      // Aggregate→Expand plan sits over the 3-way join tree, the
      // matcher recognizes the star source beneath the Expand, and
      // the grouping-sets plan is rebuilt over the summary partials —
      // subtotal and grand-total rows included, with zero joins and
      // zero fact I/O (hard-asserted). The mv5 Expand machinery and
      // the mv10 join matcher composed; at 100 TB a ROLLUP dashboard
      // over fact ⋈ dims is the single most expensive recurring
      // query shape this engine serves.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv12_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv12_" + Integer.toHexString(root.hashCode)
        val factP = root + "/rfact"
        val d1P = root + "/rpart"
        val d2P = root + "/rsupp"
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          graft.catalog.Layout.writeClusteredZoned(
            t(s, dir, "lineitem").select(
              col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
              col("l_extendedprice").cast("decimal(18,2)").as("price"),
              col("l_orderkey").as("ok")),
            factP, "pk", "ok", numBuckets = 4, filesPerBucket = 4)
          graft.catalog.Layout.writeClusteredZoned(
            t(s, dir, "part").select(
              col("p_partkey").as("pk2"), col("p_brand").as("brand")),
            d1P, "brand", "pk2", numBuckets = 4, filesPerBucket = 2)
          graft.catalog.Layout.writeClusteredZoned(
            t(s, dir, "supplier").select(
              col("s_suppkey").as("sk2"), col("s_nationkey").as("snat")),
            d2P, "snat", "sk2", numBuckets = 2, filesPerBucket = 2)
          Mv.buildStar(
            s.read.parquet(factP).select("pk", "sk", "price"),
            Seq(s.read.parquet(d1P).select("pk2", "brand")
                -> Seq("pk" -> "pk2"),
              s.read.parquet(d2P).select("sk2", "snat")
                -> Seq("sk" -> "sk2")),
            name, dims = Seq("brand", "snat"), measures = Seq("price"),
            mvPath = root + "/mv")
        }
        Mv.install(s)
        s.read.parquet(factP).createOrReplaceTempView("mv12f")
        s.read.parquet(d1P).createOrReplaceTempView("mv12p")
        s.read.parquet(d2P).createOrReplaceTempView("mv12s")
        assertMvScan(s.sql(
          "SELECT brand, snat, CAST(sum(price) AS DOUBLE) AS revenue, " +
            "count(1) AS n " +
            "FROM mv12f JOIN mv12p ON pk = pk2 JOIN mv12s ON sk = sk2 " +
            "GROUP BY ROLLUP(brand, snat) " +
            "ORDER BY brand NULLS FIRST, snat NULLS FIRST"))
      },
      Some("WITH rfact AS (SELECT l_partkey AS pk, l_suppkey AS sk, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS price FROM lineitem), " +
        "rpart AS (SELECT p_partkey AS pk2, p_brand AS brand FROM part), " +
        "rsupp AS (SELECT s_suppkey AS sk2, s_nationkey AS snat FROM supplier) " +
        "SELECT brand, snat, CAST(sum(price) AS DOUBLE) AS revenue, " +
        "count(*) AS n FROM rfact JOIN rpart ON pk = pk2 " +
        "JOIN rsupp ON sk = sk2 GROUP BY ROLLUP(brand, snat) " +
        "ORDER BY brand NULLS FIRST, snat NULLS FIRST")),

    Q("mv13_minmax_retraction",
      // MIN/MAX SURVIVE NON-EXTREMAL RETRACTIONS: a MIN/MAX-carrying
      // summary used to refuse every deleting refresh (rebuild-only).
      // The extremal-tie guard makes the common case incremental: a
      // CDC delete of rows STRICTLY INSIDE their groups' stored
      // extremes provably cannot move MIN or MAX, so the retraction
      // folds O(feed+MV) — one batch-sized deletes ⋈ MV probe decides.
      // Here every status group carries sentinel extreme rows (-1 and
      // 9e9), the middle slice (ok % 10 = 3) is DV-deleted, compacted
      // out, fully vacuumed, and the log refresh folds the rw_*
      // retraction THROUGH the MIN/MAX partials; the rewrite then
      // answers min/max/count over the post-delete base from the
      // summary (hard-asserted + oracle-checked). A delete that ties
      // an extreme still refuses loudly (spec-pinned).
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv13_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv13_" + Integer.toHexString(root.hashCode)
        val factP = root + "/xfact"
        def q: DataFrame = s.read.parquet(factP)
          .groupBy("status").agg(
            min("ok").as("mn"), max("ok").as("mx"),
            count(lit(1)).as("n")).orderBy("status")
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          val o = t(s, dir, "orders").select(
            col("o_orderstatus").as("status"), col("o_orderkey").as("ok"))
          val sentinels = o.select("status").distinct()
            .select(col("status"), lit(-1L).as("ok"))
            .unionByName(o.select("status").distinct()
              .select(col("status"), lit(9000000000L).as("ok")))
          graft.catalog.Layout.writeClusteredZoned(
            o.unionByName(sentinels), factP,
            "status", "ok", numBuckets = 4, filesPerBucket = 4)
          Mv.build(s.read.parquet(factP), name, Seq("status"),
            measures = Seq("ok"), mvPath = root + "/mv",
            mins = Seq("ok"), maxs = Seq("ok"))
          Mv.install(s)
          assertMvScan(q)
          // CDC delete of a strictly-inside slice, then materialize it
          // out of the plain read
          graft.catalog.Layout.delete(s, factP, "ok",
            pmod(col("ok"), lit(10)) === 3)
          Mv.refreshFromLog(s, name) // dv-only restamp
          graft.catalog.Layout.compact(s, factP, "status", "ok",
            filesPerBucket = 4)
          graft.catalog.Layout.vacuum(s, factP, retainPrevious = false)
          require(scanRoots(q).exists(_.endsWith("/xfact")),
            "staleness guard should suspend the rewrite after the compact")
        }
        Mv.install(s)
        // the retraction folds THROUGH the MIN/MAX partials
        Mv.refreshFromLog(s, name)
        assertMvScan(q)
      },
      Some("WITH xfact AS (SELECT o_orderstatus AS status, " +
        "o_orderkey AS ok FROM orders " +
        "UNION ALL SELECT DISTINCT o_orderstatus, -1 FROM orders " +
        "UNION ALL SELECT DISTINCT o_orderstatus, 9000000000 FROM orders) " +
        "SELECT status, min(ok) AS mn, max(ok) AS mx, count(*) AS n " +
        "FROM xfact WHERE ok % 10 <> 3 " +
        "GROUP BY status ORDER BY status")),

    Q("mv11_lossless_rollup",
      // LOSSLESS SUBSET-JOIN REWRITE (the Oracle/Calcite "join back"
      // class): the summary pre-joins lineitem ⋈ part ⋈ supplier, and
      // buildStar AUDITS each join fact-multiplicity-preserving (fact
      // keys non-null + all matched + dim key unique — the verified-FK
      // condition). A query joining ONLY part — the supplier join
      // absent — is then still answered from the summary by rolling
      // the supplier dim up (hard-asserted: no fact scan, no supplier
      // scan, zero joins), because the omitted preserving join cannot
      // change fact multiplicity. Wrong-by-default without the audit:
      // an unmatched or duplicated supplier key would make the
      // summary under/over-count this query, which is why the flag is
      // earned at build and DOWNGRADED by any window that breaks it.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_mv11_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "mv11_" + Integer.toHexString(root.hashCode)
        val factP = root + "/lfact"
        val d1P = root + "/lpart"
        val d2P = root + "/lsupp"
        def q: DataFrame = s.read.parquet(factP)
          .join(s.read.parquet(d1P), col("pk") === col("pk2"), "inner")
          .groupBy("brand").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("brand")
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          val f = t(s, dir, "lineitem").select(
            col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
            col("l_extendedprice").cast("decimal(18,2)").as("price"),
            col("l_orderkey").as("ok"))
          graft.catalog.Layout.writeClusteredZoned(f, factP,
            "pk", "ok", numBuckets = 4, filesPerBucket = 4)
          graft.catalog.Layout.writeClusteredZoned(
            t(s, dir, "part").select(
              col("p_partkey").as("pk2"), col("p_brand").as("brand")),
            d1P, "brand", "pk2", numBuckets = 4, filesPerBucket = 2)
          graft.catalog.Layout.writeClusteredZoned(
            t(s, dir, "supplier").select(
              col("s_suppkey").as("sk2"), col("s_nationkey").as("snat")),
            d2P, "snat", "sk2", numBuckets = 2, filesPerBucket = 2)
          val d = Mv.buildStar(
            s.read.parquet(factP).select("pk", "sk", "price"),
            Seq(s.read.parquet(d1P).select("pk2", "brand")
                -> Seq("pk" -> "pk2"),
              s.read.parquet(d2P).select("sk2", "snat")
                -> Seq("sk" -> "sk2")),
            name, dims = Seq("brand", "snat"), measures = Seq("price"),
            mvPath = root + "/mv")
          require(d.joins.forall(_.preserving),
            "TPC-H FKs must audit preserving: " + d.joins)
        }
        Mv.install(s)
        assertMvScan(q) // fires with the supplier join ABSENT
        require(!scanRoots(q).exists(_.endsWith("/lsupp")),
          "the omitted supplier dim must not be scanned either")
        q
      },
      Some("WITH lfact AS (SELECT l_partkey AS pk, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS price FROM lineitem), " +
        "lpart AS (SELECT p_partkey AS pk2, p_brand AS brand FROM part) " +
        "SELECT brand, CAST(sum(price) AS DOUBLE) AS revenue, " +
        "count(*) AS n FROM lfact JOIN lpart ON pk = pk2 " +
        "GROUP BY brand ORDER BY brand")),

    Q("j25_fk_reverify",
      // INCREMENTAL FK RE-VERIFICATION: the edge is declared while the
      // snapshot-logged child holds only the pre-1997 orders; a
      // nightly append then moves the table, so the staleness guard
      // SUSPENDS the join elimination (hard-asserted). Instead of
      // re-auditing both tables (O(table)), reverifyAppended walks the
      // child's hop chain — the appended batch FK-audits against the
      // dim (O(batch+dim)), a dv-only delete restamps free (the plain
      // read is bit-identical), and a compact + full vacuum restamps
      // through the RewriteHop (a child subset stays orphan-free) —
      // re-stamping at the audited snapshots each time; the rewrite
      // RESUMES (hard-asserted: the dim scan is gone again). The
      // oracle pays the real join over the same surviving rows.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_jr_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "jr_" + Integer.toHexString(root.hashCode)
        val childP = root + "/child"
        val dimP = root + "/dim"
        def scansOf(df: DataFrame): Set[String] = scanRoots(df)
        def q: DataFrame = s.read.parquet(childP)
          .join(s.read.parquet(dimP), col("ck") === col("ck2"), "inner")
          .groupBy("symbol").agg(
            count(lit(1)).as("n"),
            sum(col("price")).cast("double").as("revenue")).orderBy("symbol")
        if (FkCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          val o = t(s, dir, "orders").select(
            col("o_orderstatus").as("symbol"),
            to_date(col("o_orderdate")).as("ship"),
            col("o_custkey").as("ck"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
          val cut = lit("1997-01-01").cast("date")
          graft.catalog.Layout.writeClusteredZoned(o.filter(col("ship") < cut),
            childP, "symbol", "ship", numBuckets = 4, filesPerBucket = 4)
          t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
            .write.mode("overwrite").parquet(dimP)
          JoinElim.declareVerified(name,
            s.read.parquet(childP), Seq("ck"),
            s.read.parquet(dimP), Seq("ck2"))
          JoinElim.install(s)
          require(!scansOf(q).exists(_.endsWith("/dim")),
            "join elimination should fire at declaration")
          // the nightly append: the child moves, the audit stamp no
          // longer matches, the rewrite must SUSPEND
          graft.catalog.Layout.appendClusteredZoned(
            o.filter(col("ship") >= cut), childP, "symbol", "ship",
            numBuckets = 4, filesPerBucket = 4)
          require(scansOf(q).exists(_.endsWith("/dim")),
            "staleness guard should suspend the rewrite after the append")
          // append window audited → rewrite resumes
          JoinElim.reverifyAppended(s, name)
          require(!scansOf(q).exists(_.endsWith("/dim")),
            "append-window audit should restore the rewrite")
          // dv delete: the plain read is bit-identical → free restamp
          graft.catalog.Layout.delete(s, childP, "ship",
            col("symbol") === "P")
          JoinElim.reverifyAppended(s, name)
          require(!scansOf(q).exists(_.endsWith("/dim")),
            "a dv-only window should restamp without suspending")
          // compact + full vacuum: physical rewrite — the RewriteHop
          // (child subset, orphan-free by construction) restamps below
          graft.catalog.Layout.compact(s, childP, "symbol", "ship",
            filesPerBucket = 4)
          graft.catalog.Layout.vacuum(s, childP, retainPrevious = false)
          require(scansOf(q).exists(_.endsWith("/dim")),
            "staleness guard should suspend the rewrite after the compact")
        }
        JoinElim.install(s)
        // O(window) re-verification; idempotent when nothing moved
        JoinElim.reverifyAppended(s, name)
        val df = q
        require(!scansOf(df).exists(_.endsWith("/dim")) &&
          scansOf(df).exists(_.endsWith("/child")),
          s"re-verified edge should restore the rewrite; scans = ${scansOf(df)}")
        df
      },
      Some("WITH child AS (SELECT o_orderstatus AS symbol, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_custkey AS ck " +
        "FROM orders WHERE o_orderstatus <> 'P'), " +
        "dim AS (SELECT c_custkey AS ck2 FROM customer) " +
        "SELECT symbol, count(*) AS n, CAST(sum(price) AS DOUBLE) AS revenue " +
        "FROM child JOIN dim ON ck = ck2 GROUP BY symbol ORDER BY symbol")),

    Q("s30_unique_reverify",
      // INCREMENTAL UNIQUE-KEY RE-VERIFICATION (the single-table twin
      // of j25): DISTINCT elimination is suspended by a nightly append
      // and restored by auditing ONLY the appended window's keys
      // against the table (semi-join restriction — batch-sized state),
      // never the full table. The hop chain then carries the key
      // through the table's whole maintenance life: a dv delete
      // restamps free (plain read unchanged), and a compact + full
      // vacuum restamps through the RewriteHop (uniqueness survives
      // any row subset). Hard-asserts suspend + resume at each step;
      // the oracle runs the real DISTINCT over the same survivors.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_ur_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "ur_" + Integer.toHexString(root.hashCode)
        val tp = root + "/t"
        def q: DataFrame = s.read.parquet(tp)
          .select("ok", "status").distinct().orderBy("ok")
        def hasAgg: Boolean =
          q.queryExecution.optimizedPlan.toString.contains("Aggregate")
        if (PkCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          val o = t(s, dir, "orders").select(
            col("o_orderstatus").as("status"),
            to_date(col("o_orderdate")).as("ship"),
            col("o_orderkey").as("ok"))
          val cut = lit("1997-01-01").cast("date")
          graft.catalog.Layout.writeClusteredZoned(o.filter(col("ship") < cut),
            tp, "status", "ship", numBuckets = 4, filesPerBucket = 4)
          DistinctElim.declareUniqueKey(name, s.read.parquet(tp), Seq("ok"))
          DistinctElim.install(s)
          require(!hasAgg, "distinct elimination should fire at declaration")
          graft.catalog.Layout.appendClusteredZoned(
            o.filter(col("ship") >= cut), tp, "status", "ship",
            numBuckets = 4, filesPerBucket = 4)
          require(hasAgg,
            "staleness guard should suspend the elimination after the append")
          // append window audited → elimination resumes
          DistinctElim.reverifyAppended(s, name)
          require(!hasAgg, "append-window audit should restore the elimination")
          // dv delete: plain read unchanged → free restamp
          graft.catalog.Layout.delete(s, tp, "ship", col("ok") % 10 === 7)
          DistinctElim.reverifyAppended(s, name)
          require(!hasAgg, "a dv-only window should restamp without suspending")
          // compact + full vacuum: the RewriteHop (row subset keeps
          // uniqueness) restamps below
          graft.catalog.Layout.compact(s, tp, "status", "ship",
            filesPerBucket = 4)
          graft.catalog.Layout.vacuum(s, tp, retainPrevious = false)
          require(hasAgg,
            "staleness guard should suspend the elimination after the compact")
        }
        DistinctElim.install(s)
        DistinctElim.reverifyAppended(s, name)
        val df = q
        require(!df.queryExecution.optimizedPlan.toString.contains("Aggregate"),
          "re-verified key should restore the elimination:\n" +
            df.queryExecution.optimizedPlan)
        df
      },
      Some("SELECT DISTINCT o_orderkey AS ok, o_orderstatus AS status " +
        "FROM orders WHERE o_orderkey % 10 <> 7 ORDER BY ok")),

    Q("s27_distinct_elim",
      // PK-verified distinct elimination: DISTINCT over a superset of
      // a verified unique key is a per-row no-op, so the aggregate
      // (and its SHUFFLE) must vanish from the plan — hard-asserted;
      // the oracle still runs the real DISTINCT
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_de_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "de_" + Integer.toHexString(root.hashCode)
        if (PkCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_orderkey").as("ok"), col("o_orderstatus").as("status"))
            .write.mode("overwrite").parquet(root + "/t")
          DistinctElim.declareUniqueKey(name,
            s.read.parquet(root + "/t"), Seq("ok"))
        }
        DistinctElim.install(s)
        val df = s.read.parquet(root + "/t")
          .select("ok", "status").distinct().orderBy("ok")
        require(!df.queryExecution.optimizedPlan.toString.contains("Aggregate"),
          "distinct elimination did not fire:\n" +
            df.queryExecution.optimizedPlan)
        df
      },
      Some("SELECT DISTINCT o_orderkey AS ok, o_orderstatus AS status " +
        "FROM orders ORDER BY ok")),

    Q("c1_composite_star_topk",
      // COMPOSED-PLAN GATE — the TPC-H Q3 shape where THREE rewrites
      // must cooperate inside one query: fact ⋈ dim (star MV answers
      // the aggregate) LEFT JOIN a priority dim "just in case" (PK
      // outer-join elimination drops it) + filter + top-k, run twice
      // with the planner-probed result cache serving the repeat. Each
      // rewrite is already gated in isolation (mv4 / j26 / m6); the
      // 100×-scale risk is their INTERACTION — rule ordering across
      // the fixed point, one rewrite exposing the next one's pattern —
      // so this gate plan-asserts the first run scans ONLY the MV
      // (both the unused dim AND the fact are gone from one plan) and
      // the repeat scans ONLY the cache entry. The oracle pays all
      // three joins from the raw tables.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_c1_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "c1_" + Integer.toHexString(root.hashCode)
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderpriority").as("prio"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(root + "/fact")
          t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
            .write.mode("overwrite").parquet(root + "/dim")
          t(s, dir, "orders").select(col("o_orderpriority").as("prio2"))
            .distinct().withColumn("pdesc", concat(lit("P:"), col("prio2")))
            .write.mode("overwrite").parquet(root + "/pdim")
          Mv.buildJoin(s.read.parquet(root + "/fact"),
            s.read.parquet(root + "/dim"), name, on = Seq("ck" -> "ck2"),
            dims = Seq("seg", "status"), measures = Seq("price"),
            mvPath = root + "/mv")
          DistinctElim.declareUniqueKey(name + "_pk",
            s.read.parquet(root + "/pdim"), Seq("prio2"))
        }
        Mv.install(s)
        JoinElim.install(s)
        graft.analytics.ResultCache.install(s)
        def q = s.read.parquet(root + "/fact")
          .join(s.read.parquet(root + "/dim"),
            col("ck") === col("ck2"), "inner")
          .join(s.read.parquet(root + "/pdim"),
            col("prio") === col("prio2"), "left")
          .filter(col("status") === "F")
          .groupBy("seg").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(desc("revenue"), col("seg")).limit(3)
        // run 1 (no cache conf): BOTH rewrites in ONE plan — the
        // unused pdim is eliminated AND the star summary answers; no
        // base table and no join survives
        val p1 = q.queryExecution.optimizedPlan
        val scans1 = scanRoots(q)
        require(scans1.nonEmpty && scans1.forall(_.endsWith("/mv")),
          s"composite rewrite did not reduce to the MV scan; scans = $scans1")
        require(!p1.toString.contains("Join"),
          s"a join survived the composite rewrite:\n$p1")
        // runs 2+3 (cache conf on): populate, then the repeat serves
        // from the entry — metadata + the 3-row result only
        val cacheRoot = root + "/rescache"
        s.conf.set("graft.resultcache.dir", cacheRoot)
        try {
          q.collect()
          val served = q
          val scans2 = scanRoots(served)
          require(scans2.nonEmpty &&
            scans2.forall(_.contains("/rescache")),
            s"result cache did not serve the repeat; scans = $scans2")
          served
        } finally s.conf.unset("graft.resultcache.dir")
      },
      Some("WITH fact AS (SELECT o_custkey AS ck, o_orderpriority AS prio, " +
        "o_orderstatus AS status, CAST(o_totalprice AS DECIMAL(18,2)) AS price " +
        "FROM orders), " +
        "dim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer), " +
        "pdim AS (SELECT DISTINCT o_orderpriority AS prio2, " +
        "'P:' || o_orderpriority AS pdesc FROM orders) " +
        "SELECT seg, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM fact JOIN dim ON ck = ck2 LEFT JOIN pdim ON prio = prio2 " +
        "WHERE status = 'F' GROUP BY seg " +
        "ORDER BY revenue DESC, seg LIMIT 3")),

    Q("c2_composite_semi_star",
      // COMPOSED-PLAN GATE — FK semi-probe elimination feeding the
      // star-MV rewrite: the query keeps the BI-generated
      // `WHERE EXISTS (dim)` guard on a fact that carries a NULL-keyed
      // row, then re-joins the dim and aggregates. j27 must reduce the
      // probe to Filter(ck IS NOT NULL) FIRST, and the star rewrite
      // must then recognize that residual as the inner join's own
      // null-drop and still answer from the summary — the exact
      // rule-interaction chain (one rewrite EXPOSES the next one's
      // pattern) that isolation gates cannot see. Hard-asserted: the
      // final plan scans only the MV.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_c2_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "c2_" + Integer.toHexString(root.hashCode)
        if (MvCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_custkey").as("ck"), col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .unionByName(s.range(1).select(
              lit(null).cast("bigint").as("ck"), lit("X").as("status"),
              lit("9.00").cast("decimal(18,2)").as("price")))
            .write.mode("overwrite").parquet(root + "/fact")
          t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
            .write.mode("overwrite").parquet(root + "/dim")
          // the star summary is the INNER join (drops the NULL row)
          Mv.buildJoin(s.read.parquet(root + "/fact"),
            s.read.parquet(root + "/dim"), name, on = Seq("ck" -> "ck2"),
            dims = Seq("seg", "status"), measures = Seq("price"),
            mvPath = root + "/mv")
          // the FK edge powering the semi-probe elimination
          JoinElim.declareVerified(name + "_fk",
            s.read.parquet(root + "/fact"), Seq("ck"),
            s.read.parquet(root + "/dim"), Seq("ck2"))
        }
        Mv.install(s)
        JoinElim.install(s)
        val dimDf = s.read.parquet(root + "/dim")
        val df = s.read.parquet(root + "/fact")
          .join(dimDf, col("ck") === col("ck2"), "left_semi")
          .join(dimDf, col("ck") === col("ck2"), "inner")
          .groupBy("seg").agg(
            sum("price").cast("double").as("revenue"),
            count(lit(1)).as("n")).orderBy("seg")
        val scans = scanRoots(df)
        require(scans.nonEmpty && scans.forall(_.endsWith("/mv")),
          s"semi-elim → star-MV chain did not reduce to the MV; " +
            s"scans = $scans")
        df
      },
      Some("WITH fact AS (SELECT o_custkey AS ck, o_orderstatus AS status, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders " +
        "UNION ALL SELECT NULL, 'X', CAST(9.00 AS DECIMAL(18,2))), " +
        "dim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT seg, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM fact JOIN dim ON ck = ck2 " +
        "WHERE EXISTS (SELECT 1 FROM dim WHERE ck2 = ck) " +
        "GROUP BY seg ORDER BY seg")),

    Q("c3_composite_elim_stack",
      // COMPOSED-PLAN GATE — outer-join elimination feeding aggregate
      // elimination, with the result cache proving NON-interference:
      // GROUP BY the verified-unique fact key under a rote LEFT JOIN
      // must collapse to a bare Project over the fact scan (j26 drops
      // the dim, THEN s31's rewrite sees Aggregate-over-scan and drops
      // the whole shuffle — neither fires without the other clearing
      // the way). With the cache conf ON, the rule must still decline
      // (after elimination there is no aggregate, i.e. no small-result
      // contract) — a per-row projection must never be routed through
      // the result cache. Hard-asserted: no Join, no Aggregate, scans
      // stay on the fact, no cache entry born.
      (s, dir) => {
        val root = System.getProperty("java.io.tmpdir") + "/graft_c3_" +
          s.sparkContext.applicationId + "_" + Integer.toHexString(dir.hashCode)
        val name = "c3_" + Integer.toHexString(root.hashCode)
        if (PkCatalog.get(name).isEmpty) {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          t(s, dir, "orders").select(
            col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
            .write.mode("overwrite").parquet(root + "/fact")
          t(s, dir, "customer").select(
            col("c_custkey").as("ck2"), col("c_mktsegment").as("seg"))
            .write.mode("overwrite").parquet(root + "/dim")
          DistinctElim.declareUniqueKey(name,
            s.read.parquet(root + "/fact"), Seq("ok"))
          DistinctElim.declareUniqueKey(name + "_dim",
            s.read.parquet(root + "/dim"), Seq("ck2"))
        }
        JoinElim.install(s)
        DistinctElim.install(s)
        graft.analytics.ResultCache.install(s)
        s.conf.set("graft.resultcache.dir", root + "/rescache")
        try {
          val df = s.read.parquet(root + "/fact")
            .join(s.read.parquet(root + "/dim"),
              col("ck") === col("ck2"), "left")
            .groupBy("ok").agg(
              sum("price").cast("double").as("revenue"),
              count(lit(1)).as("n"),
              max(col("status")).as("st")).orderBy("ok")
          val plan = df.queryExecution.optimizedPlan
          require(!plan.toString.contains("Join"),
            s"outer-join elimination did not fire:\n$plan")
          require(!plan.toString.contains("Aggregate"),
            s"aggregate elimination did not fire after the join fell:\n$plan")
          val scans = scanRoots(df)
          require(scans.nonEmpty && scans.forall(_.endsWith("/fact")),
            s"expected a bare fact projection; scans = $scans")
          df
        } finally s.conf.unset("graft.resultcache.dir")
      },
      Some("WITH fact AS (SELECT o_orderkey AS ok, o_custkey AS ck, " +
        "o_orderstatus AS status, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders), " +
        "dim AS (SELECT c_custkey AS ck2, c_mktsegment AS seg FROM customer) " +
        "SELECT ok, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n, " +
        "max(status) AS st FROM fact LEFT JOIN dim ON ck = ck2 " +
        "GROUP BY ok ORDER BY ok")),

    Q("c4_q5_join_chain",
      // TPC-H Q5 verbatim shape — the classic 6-table analytic join
      // chain (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈
      // region) with the local-supplier nation equality, a region
      // constant, and an order-date range, aggregated to revenue per
      // nation. No graft rewrite machinery here on purpose: this gate
      // pins that the PLAIN declarative plan comes out right at scale —
      // Catalyst broadcasts every dim, pushes the timestamp range into
      // the orders scan, and never degenerates to a cartesian
      // (physical shape pinned in PlanQualitySpec). Revenue is exact
      // decimal inside, DOUBLE surfaced.
      (s, dir) => {
        val rev = sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")))
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(round(rev, 2).cast("double").as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("SELECT n_name, CAST(round(sum(" +
        "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue " +
        "FROM customer, orders, lineitem, supplier, nation, region " +
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey " +
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey " +
        "AND r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1995-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name")),

    Q("c5_q17_decorrelated",
      // TPC-H Q17 verbatim shape — the CORRELATED SCALAR SUBQUERY
      // (per-part average quantity threshold) through the SQL surface.
      // What this pins: Catalyst DECORRELATES the subquery into an
      // aggregate + join — executed once over the grouped lineitem,
      // never per outer row (a per-row plan is the classic O(n²)
      // correlated-subquery trap at 100 TB; PlanQualitySpec asserts
      // the join-based physical shape, no nested loop). Sum is exact
      // decimal inside; the /7.0 runs in DOUBLE on both engines.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("c5_lineitem")
        t(s, dir, "part").createOrReplaceTempView("c5_part")
        s.sql("SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS " +
          "DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly " +
          "FROM c5_lineitem l, c5_part p " +
          "WHERE p_partkey = l_partkey AND p_brand = 'Brand#4' " +
          "AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) " +
          "FROM c5_lineitem l2 WHERE l2.l_partkey = p_partkey)")
      },
      Some("SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS " +
        "DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly " +
        "FROM lineitem l, part p " +
        "WHERE p_partkey = l_partkey AND p_brand = 'Brand#4' " +
        "AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) " +
        "FROM lineitem l2 WHERE l2.l_partkey = p_partkey)")),

    Q("c6_q20_nested_semi",
      // TPC-H Q20 verbatim shape — NESTED IN-subqueries with a HAVING
      // between them: suppliers who moved more than a threshold
      // quantity of a part class. Catalyst must plan the whole nest as
      // semi-join → grouped aggregate → semi-join (each subquery
      // becomes ONE join, the part probe a broadcast semi into the
      // lineitem scan), never a per-row re-execution — the physical
      // shape is pinned in PlanQualitySpec. c5 pins correlated SCALAR
      // decorrelation; this pins the IN-predicate (ListQuery) class.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("c6_lineitem")
        t(s, dir, "part").createOrReplaceTempView("c6_part")
        t(s, dir, "supplier").createOrReplaceTempView("c6_supplier")
        s.sql("SELECT s_name FROM c6_supplier WHERE s_suppkey IN (" +
          "SELECT l_suppkey FROM c6_lineitem WHERE l_partkey IN (" +
          "SELECT p_partkey FROM c6_part WHERE p_type = 'ECONOMY') " +
          "GROUP BY l_suppkey HAVING sum(l_quantity) > 2000) " +
          "ORDER BY s_name")
      },
      Some("SELECT s_name FROM supplier WHERE s_suppkey IN (" +
        "SELECT l_suppkey FROM lineitem WHERE l_partkey IN (" +
        "SELECT p_partkey FROM part WHERE p_type = 'ECONOMY') " +
        "GROUP BY l_suppkey HAVING sum(l_quantity) > 2000) " +
        "ORDER BY s_name")),

    Q("c7_q21_exists_anti",
      // TPC-H Q21 shape — correlated EXISTS + NOT EXISTS against the
      // SAME table ("suppliers who kept orders waiting"): for each
      // flagged lineitem there must EXIST another supplier's line on
      // the same order, and NOT EXIST another supplier's FLAGGED line.
      // The decorrelation class c5 (scalar) and c6 (IN/ListQuery)
      // don't cover: Catalyst must plan the pair as ONE left-semi plus
      // ONE left-anti join over the self-joined lineitem — never
      // per-row subquery re-execution, the O(n²) trap at 100 TB
      // (physical shape pinned in PlanQualitySpec: both join types
      // present, no nested loop, exactly 3 lineitem scans). The
      // reference analog is the multi-EXISTS ACL gate (lists.js
      // routes). Q21's receipt/commit-date lateness maps to the
      // returnflag='R' lines of 'F'-status orders on this schema.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("c7_lineitem")
        t(s, dir, "orders").createOrReplaceTempView("c7_orders")
        t(s, dir, "supplier").createOrReplaceTempView("c7_supplier")
        t(s, dir, "nation").createOrReplaceTempView("c7_nation")
        s.sql("SELECT s_name, count(*) AS numwait " +
          "FROM c7_supplier, c7_lineitem l1, c7_orders o, c7_nation " +
          "WHERE s_suppkey = l1.l_suppkey " +
          "AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F' " +
          "AND l1.l_returnflag = 'R' " +
          "AND EXISTS (SELECT 1 FROM c7_lineitem l2 " +
          "WHERE l2.l_orderkey = l1.l_orderkey " +
          "AND l2.l_suppkey <> l1.l_suppkey) " +
          "AND NOT EXISTS (SELECT 1 FROM c7_lineitem l3 " +
          "WHERE l3.l_orderkey = l1.l_orderkey " +
          "AND l3.l_suppkey <> l1.l_suppkey " +
          "AND l3.l_returnflag = 'R') " +
          "AND s_nationkey = n_nationkey AND n_name = 'NATION_3' " +
          "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10")
      },
      Some("SELECT s_name, count(*) AS numwait " +
        "FROM supplier, lineitem l1, orders o, nation " +
        "WHERE s_suppkey = l1.l_suppkey " +
        "AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F' " +
        "AND l1.l_returnflag = 'R' " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 " +
        "WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
        "WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey " +
        "AND l3.l_returnflag = 'R') " +
        "AND s_nationkey = n_nationkey AND n_name = 'NATION_3' " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10")),

    Q("c8_q15_maxview",
      // TPC-H Q15 shape — an aggregate view referenced TWICE (the
      // per-supplier revenue, and the max over it). The textbook SQL
      // recomputes the view for the scalar-max subquery — two full
      // fact scans; the Spark-first plan computes the aggregate once
      // and joins it to its own 1-row max on an EQUALITY (broadcast
      // hash join, not a nested-loop scalar compare), letting AQE's
      // exchange reuse serve both aggregate consumers from ONE
      // lineitem scan — plan-pinned in PlanQualitySpec. Revenue stays
      // exact DECIMAL through the sum AND the max-equality (double
      // sums are order-sensitive and would make '= max' flaky across
      // engines); DOUBLE only at the surface.
      (s, dir) => {
        // isNotNull(l_suppkey) lives INSIDE the view on purpose: the
        // supplier join infers it onto its own rev subtree only, and
        // the two rev consumers would then canonicalize differently —
        // exchange reuse needs both subtrees identical (a NULL suppkey
        // is not a supplier, so the view predicate is also the honest
        // semantics; mirrored in the oracle)
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
            col("l_suppkey").isNotNull)
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("tr"))
        val mx = rev.agg(max(col("tr")).as("mx"))
        rev.join(broadcast(mx), col("tr") === col("mx"), "inner")
          .join(broadcast(t(s, dir, "supplier")),
            col("s_suppkey") === col("supplier_no"), "inner")
          .select(col("s_suppkey"), col("s_name"),
            round(col("tr"), 2).cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS tr " +
        "FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01' " +
        "AND l_suppkey IS NOT NULL GROUP BY 1) " +
        "SELECT s_suppkey, s_name, " +
        "CAST(round(tr, 2) AS DOUBLE) AS total_revenue " +
        "FROM supplier, revenue " +
        "WHERE s_suppkey = supplier_no " +
        "AND tr = (SELECT max(tr) FROM revenue) " +
        "ORDER BY s_suppkey")),

    Q("c9_q13_custdist",
      // TPC-H Q13 shape — LEFT OUTER join with a NON-KEY predicate
      // inside the ON clause, then double aggregation (orders-per-
      // customer distribution, zero-order customers included). The
      // classic trap: pulling the ON-predicate out as a post-join
      // WHERE silently deletes the null-padded (zero-order) rows and
      // turns the outer join inner — the predicate must stay in the
      // join condition, plan-pinned in PlanQualitySpec. count(col)
      // counts only non-null order keys, so never-matched customers
      // land in the c_count=0 bucket on both engines.
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count")),
      Some("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c.c_custkey, count(o.o_orderkey) AS c_count " +
        "FROM customer c LEFT JOIN orders o " +
        "ON c.c_custkey = o.o_custkey " +
        "AND o.o_orderpriority <> '1-URGENT' " +
        "GROUP BY c.c_custkey) t " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC")),

    Q("c10_q16_notin",
      // TPC-H Q16 shape — NOT IN (subquery) + COUNT(DISTINCT): the
      // null-aware anti-join class, distinct from c6's IN (plain semi)
      // and c7's NOT EXISTS (plain anti). NOT IN's three-valued NULL
      // semantics historically forced a BroadcastNestedLoopJoin over
      // the whole fact — the classic 100 TB plan catastrophe; Spark
      // must plan it as a single null-aware ANTI hash join against
      // the broadcast exclusion set (plan-pinned: LeftAnti, no nested
      // loop), with the distinct-supplier count one Expand + two
      // aggregates. Complaint suppliers map to negative account
      // balances on this schema.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("c10_lineitem")
        t(s, dir, "part").createOrReplaceTempView("c10_part")
        t(s, dir, "supplier").createOrReplaceTempView("c10_supplier")
        s.sql("SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt " +
          "FROM c10_lineitem, c10_part " +
          "WHERE p_partkey = l_partkey AND p_type <> 'ECONOMY' " +
          "AND l_suppkey NOT IN (" +
          "SELECT s_suppkey FROM c10_supplier WHERE s_acctbal < 0) " +
          "GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand")
      },
      Some("SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM lineitem, part " +
        "WHERE p_partkey = l_partkey AND p_type <> 'ECONOMY' " +
        "AND l_suppkey NOT IN (" +
        "SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand")),

    Q("c11_q2_min_supply",
      // TPC-H Q2 shape — a correlated scalar MIN subquery that itself
      // contains a JOIN CHAIN (min supply price among suppliers of one
      // region). The hardest decorrelation class in the c-suite: the
      // inner query must be rewritten to ONE grouped aggregate over
      // the joined (lineitem ⋈ supplier ⋈ nation ⋈ region) subtree and
      // equi-joined back on the correlation key — per-row re-execution
      // would re-run a 4-table join once per part, the O(parts × fact)
      // trap at 100 TB (plan-pinned: no nested loop, no surviving
      // correlated subquery). lineitem stands in for partsupp on this
      // schema: (l_partkey, l_suppkey, l_extendedprice) is the supply
      // offer. Ties (several suppliers at the min price) all survive,
      // as in genuine Q2; DISTINCT collapses repeat offers by the same
      // supplier. The reference analog is the min-price listing lookup
      // (listings.js price routes).
      (s, dir) => {
        t(s, dir, "part").createOrReplaceTempView("c11_part")
        t(s, dir, "lineitem").createOrReplaceTempView("c11_lineitem")
        t(s, dir, "supplier").createOrReplaceTempView("c11_supplier")
        t(s, dir, "nation").createOrReplaceTempView("c11_nation")
        t(s, dir, "region").createOrReplaceTempView("c11_region")
        s.sql("SELECT DISTINCT p_partkey, p_name, s_name, " +
          "s_acctbal AS bal, n_name, l_extendedprice AS price " +
          "FROM c11_part, c11_lineitem, c11_supplier, c11_nation, c11_region " +
          "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey " +
          "AND p_size = 25 AND s_nationkey = n_nationkey " +
          "AND n_regionkey = r_regionkey AND r_name = 'ASIA' " +
          "AND l_extendedprice = (" +
          "SELECT min(l2.l_extendedprice) " +
          "FROM c11_lineitem l2, c11_supplier s2, c11_nation n2, c11_region r2 " +
          "WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey " +
          "AND s2.s_nationkey = n2.n_nationkey " +
          "AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA') " +
          "ORDER BY bal DESC, n_name, s_name, p_partkey LIMIT 100")
      },
      Some("SELECT DISTINCT p_partkey, p_name, s_name, " +
        "s_acctbal AS bal, n_name, l_extendedprice AS price " +
        "FROM part, lineitem, supplier, nation, region " +
        "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey " +
        "AND p_size = 25 AND s_nationkey = n_nationkey " +
        "AND n_regionkey = r_regionkey AND r_name = 'ASIA' " +
        "AND l_extendedprice = (" +
        "SELECT min(l2.l_extendedprice) " +
        "FROM lineitem l2, supplier s2, nation n2, region r2 " +
        "WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey " +
        "AND s2.s_nationkey = n2.n_nationkey " +
        "AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA') " +
        "ORDER BY bal DESC, n_name, s_name, p_partkey LIMIT 100")),

    Q("c12_q22_anti_scalar",
      // TPC-H Q22 shape — an UNCORRELATED scalar aggregate threshold
      // (global average balance) combined with a correlated NOT EXISTS
      // (no urgent orders). Two distinct subquery machineries in one
      // query: the scalar must execute ONCE and broadcast as a literal
      // into the filter (never re-evaluated per row); the NOT EXISTS
      // must plan as one LeftAnti hash join (plan-pinned). The balance
      // sum rides DECIMAL for order-independent exactness and the
      // threshold divides an exact-decimal sum cast to DOUBLE by the
      // count, so both engines compare against the bit-identical
      // threshold. This schema has no customer without orders, so the
      // anti side is "no URGENT order" — same plan class as genuine
      // Q22's "no order at all".
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("c12_customer")
        t(s, dir, "orders").createOrReplaceTempView("c12_orders")
        s.sql("SELECT c_mktsegment, count(*) AS numcust, " +
          "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal " +
          "FROM c12_customer " +
          "WHERE c_acctbal > (" +
          "SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) " +
          "FROM c12_customer WHERE c_acctbal > 0.0) " +
          "AND NOT EXISTS (SELECT 1 FROM c12_orders " +
          "WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment")
      },
      Some("SELECT c_mktsegment, count(*) AS numcust, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal " +
        "FROM customer " +
        "WHERE c_acctbal > (" +
        "SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) " +
        "FROM customer WHERE c_acctbal > 0.0) " +
        "AND NOT EXISTS (SELECT 1 FROM orders " +
        "WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")),

    Q("c13_q11_having_scalar",
      // TPC-H Q11 shape — GROUP BY … HAVING sum(v) > (SELECT sum(v) *
      // fraction): a grouped aggregate filtered against a SCALAR of
      // the SAME aggregate over the whole table. The plan must compute
      // the global sum once (its own aggregate over a second scan) and
      // feed it into the HAVING filter as a one-row broadcast — the
      // trap is re-evaluating the global sum per group. Money rides
      // BIGINT×DECIMAL so both the per-group and global sums are
      // exact and the HAVING comparison is decimal-exact on both
      // engines; DOUBLE only at the surface.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("c13_lineitem")
        s.sql("SELECT l_partkey, " +
          "CAST(sum(CAST(l_quantity AS BIGINT) * " +
          "CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value " +
          "FROM c13_lineitem GROUP BY l_partkey " +
          "HAVING sum(CAST(l_quantity AS BIGINT) * " +
          "CAST(l_extendedprice AS DECIMAL(18,2))) > (" +
          "SELECT sum(CAST(l_quantity AS BIGINT) * " +
          "CAST(l_extendedprice AS DECIMAL(18,2))) * 0.0005 FROM c13_lineitem) " +
          "ORDER BY part_value DESC, l_partkey LIMIT 100")
      },
      Some("SELECT l_partkey, " +
        "CAST(sum(CAST(l_quantity AS BIGINT) * " +
        "CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value " +
        "FROM lineitem GROUP BY l_partkey " +
        "HAVING sum(CAST(l_quantity AS BIGINT) * " +
        "CAST(l_extendedprice AS DECIMAL(18,2))) > (" +
        "SELECT sum(CAST(l_quantity AS BIGINT) * " +
        "CAST(l_extendedprice AS DECIMAL(18,2))) * 0.0005 FROM lineitem) " +
        "ORDER BY part_value DESC, l_partkey LIMIT 100")),

    Q("c14_q8_market_share",
      // TPC-H Q8 shape — conditional aggregation RATIO over a 5-table
      // join chain (one nation's share of yearly volume): sum(CASE
      // WHEN nation THEN volume END) / sum(volume) per year. The
      // Spark-first form: dims broadcast (part/supplier/nation), ONE
      // shuffle for the year rollup, the CASE folded into the partial
      // (map-side) aggregate — never a self-join of per-year totals
      // against per-year-per-nation totals, which would scan the fact
      // twice and shuffle twice. Volume rides DECIMAL through both
      // sums (order-independent), so the ratio divides bit-identical
      // doubles on both engines. Plan-pinned: ≥3 broadcast joins, no
      // cartesian, partial aggregation present.
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "part")), col("p_partkey") === col("l_partkey"))
        .join(broadcast(t(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
        .filter(col("p_type") === "ECONOMY")
        .select(year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("volume"),
          col("n_name"))
        .groupBy(col("o_year"))
        .agg(round(
          sum(when(col("n_name") === "NATION_3", col("volume"))
            .otherwise(lit(0))).cast("double") /
            sum(col("volume")).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year"),
      Some("SELECT o_year, round(CAST(nat AS DOUBLE) / CAST(vol AS DOUBLE), 6) " +
        "AS mkt_share FROM (" +
        "SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
        "sum(CASE WHEN n_name = 'NATION_3' THEN " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS nat, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS vol " +
        "FROM orders, lineitem, part, supplier, nation " +
        "WHERE o_orderkey = l_orderkey AND p_partkey = l_partkey " +
        "AND s_suppkey = l_suppkey AND n_nationkey = s_nationkey " +
        "AND p_type = 'ECONOMY' GROUP BY 1) ORDER BY o_year")),

    Q("c15_dpp",
      // DYNAMIC PARTITION PRUNING — the one scan-pruning class the
      // static pins (p3 pushdown, s-gates' PartitionFilters) don't
      // cover: a month-partitioned fact joined to a dim whose filter
      // is only known at runtime must prune fact PARTITIONS at plan
      // execution (Spark's PartitionPruning rule injects a
      // `dynamicpruning#` subquery into the scan, fed by the dim's
      // reused broadcast). Reference analog: every ownership-scoped
      // fact read (portfolio.js:58-61, P6) — at warehouse scale the
      // fact is date-partitioned and the scoping dim filter must cut
      // the scan to the owned slice, not read 100 TB and filter. The
      // fact copy is written partitioned by ship_month once per
      // (session, sf-dir) — same skip-if-exists tmp-dir convention as
      // factWithMv. The dim (distinct months + their year, built from
      // the SOURCE parquet so the pin can count fact-copy scans) is
      // functionally keyed by ship_month, so the join is exactly the
      // oracle's year filter. Plan-pinned in PlanQualitySpec:
      // `dynamicpruning#` present in the scan, 12 of 83 partitions
      // actually read.
      (s, dir) => {
        val factPath = System.getProperty("java.io.tmpdir") +
          "/graft_dpp_" + s.sparkContext.applicationId + "_" +
          Integer.toHexString(dir.hashCode) + "/lineitem_by_month"
        val fp = new org.apache.hadoop.fs.Path(factPath)
        val fs = fp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(factPath, "_SUCCESS")))
          t(s, dir, "lineitem")
            .withColumn("ship_month",
              date_format(col("l_shipdate"), "yyyy-MM"))
            .write.mode("overwrite").partitionBy("ship_month")
            .parquet(factPath)
        val fact = s.read.parquet(factPath)
        val months = t(s, dir, "lineitem")
          .select(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
            year(col("l_shipdate")).as("y"))
          .distinct()
        fact.join(broadcast(months.filter(col("y") === 1996)),
            Seq("ship_month"))
          .groupBy(col("ship_month"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"))
          .orderBy("ship_month")
      },
      Some("SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem WHERE year(l_shipdate) = 1996 " +
        "GROUP BY 1 ORDER BY ship_month")),

    Q("c16_runtime_filter",
      // PLANNER-INJECTED RUNTIME BLOOM FILTER (InjectRuntimeFilter) —
      // the complement of j15's MANUAL bloom semi-join: when a
      // selective dim filter sits across a SHUFFLE join, Spark can
      // build a bloom filter over the dim's join keys
      // (bloom_filter_agg, executed once as a subquery) and push
      // `might_contain` into the fact leg, cutting the fact's shuffle
      // write before the join — the free 100 TB shuffle-reducer users
      // get only if the plan shape allows injection. The thresholds
      // exist for 100 TB (application side ≥ 10 GB), so at test SF
      // they are scoped DOWN around PLANNING ONLY (ConfScope forces
      // planning inside the scope and restores the session). The join
      // stays a SHUFFLE join at EXECUTION too via an explicit merge
      // HINT — a restored broadcast threshold would otherwise let
      // AQE's DynamicJoinSelection demote the exchange to broadcast
      // at runtime and the bloom would never cut a real shuffle
      // write (hints ride the logical plan, so AQE respects them
      // where restored conf cannot). Results are plan-independent;
      // bloom + join shape are pinned on the FINAL plan section in
      // PlanQualitySpec.
      (s, dir) => graft.ops.ConfScope.withScopedConf(s, Seq(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
        val df = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderstatus") === "F")
          .hint("merge")
          .join(t(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"))
          .orderBy("l_returnflag")
        // force analysis + optimization + physical planning while the
        // scoped thresholds are active — the memoized QueryExecution
        // is what executes later
        df.queryExecution.executedPlan
        df
      },
      Some("SELECT l_returnflag, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM orders, lineitem " +
        "WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT' " +
        "AND o_orderstatus = 'F' " +
        "GROUP BY 1 ORDER BY l_returnflag")),
  )
}
