package graft.fuzz

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.ops.ConfScope

/** Seeded random-query generator for DIFFERENTIAL testing — the
  * verdict-r18 fuzzing harness. The 246 named gates pin known query
  * shapes; the composition space (filter × join × agg × distinct over
  * the harness tables) is where the next wrong answer hides. Each
  * generated query is rendered TWICE from one in-memory description:
  *
  *   - as a DataFrame/Column plan (the engine under test), and
  *   - as one ANSI SQL string that parses in BOTH Spark SQL and
  *     DuckDB (the `c17_fuzz_differential` gate replays it in DuckDB;
  *     FuzzSpec replays it through `spark.sql` — so one corpus feeds
  *     an in-test dual-frontend check AND a cross-engine driver
  *     check).
  *
  * Determinism: the corpus is a pure function of (MasterSeed, i) —
  * the committed seed corpus IS this file. Any failure minimizes to
  * its index and gets promoted to a named gate.
  *
  * Dialect envelope (kept deliberately ANSI-common): inner joins ON
  * equi-keys, AND/OR predicates over =, <>, <, <=, >, >=, integer %,
  * LIKE 'prefix%', GROUP BY, DISTINCT, count(*)/sum/min/max,
  * CAST(x AS BIGINT), integer +, -, *. DOUBLE and TIMESTAMP
  * columns are excluded BY DESIGN: cross-engine float accumulation
  * and timestamp binning differences are handled by the named gates'
  * rounding conventions (QueryCatalog header), not worth re-litigating
  * per random query. Inner sums are written `CAST(sum(..) AS BIGINT)`
  * because DuckDB widens BIGINT sums to HUGEINT; `%` keeps every
  * partial bounded so the cast is lossless. Both engines define `%`
  * as remainder with the dividend's sign, so negative arithmetic
  * projections digest identically. */
object QueryFuzzer {

  val MasterSeed = 20260816L
  /** Indices 0 until NumQueriesV2 are the FROZEN v1/v2 corpus
    * (filter × join × agg × distinct; LEFT-JOIN null producers) —
    * their (seed, dispatch) is never touched, so a failure index from
    * an old round still reproduces. v3 appends indices 120-179:
    * EXISTS / NOT EXISTS (semi/anti), window functions (row_number /
    * lag / running sum / rank), and ORDER BY + LIMIT top-k — the
    * reference-census constructs (14 EXISTS, 8 LAG/OVER, 27 ORDER BY)
    * the named gates pin in fixed shapes but the corpus now also
    * composes randomly. */
  val NumQueriesV2 = 120
  /** v3 appended 120-179 (this round); frozen the same way once
    * committed. v4 appends 180-239: expression-level shapes — CASE
    * WHEN (including NULL-producing branches), IN / NOT IN lists,
    * HAVING over grouped counts, set operations (INTERSECT / EXCEPT /
    * UNION distinct), and scalar subqueries rendered API-side as a
    * broadcast 1-row cross join. */
  val NumQueriesV3 = 180
  /** v5 appends 240-287: COMPOSITE shapes — window functions over
    * JOIN sources, grouped aggregation over EXISTS-filtered sources,
    * top-k over joins, windows over semi-filtered tables. These
    * compose the constructs v3/v4 test in isolation, the class the
    * named c-gates pin only in fixed forms. Post-join uniqueness: an
    * FK equi-join matches each FK-side row to EXACTLY ONE pk-side row
    * (referential integrity + pk uniqueness), so the FK side's unique
    * key stays a total order over the join result. */
  val NumQueriesV4 = 240
  val NumQueries = 288

  /** Unique row keys per table (verified against the harness data —
    * lineitem's nominal (orderkey, linenumber) is NOT unique in the
    * synthetic generator's output; the 4-column extension is). Every
    * v3 ORDER BY ends with one of these so top-k retained SETS and
    * window frames are total-order deterministic cross-engine. */
  private val pks: Map[String, Seq[String]] = Map(
    "nation" -> Seq("n_nationkey"), "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey"), "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber", "l_partkey",
      "l_suppkey"))

  sealed trait Kind
  case object IntK extends Kind
  case object StrK extends Kind

  /** Column metadata: int range (predicate constants are drawn inside
    * the sf0.01 range — at other SFs only selectivity shifts) or a
    * string value pool for equality/LIKE predicates. */
  final case class FCol(name: String, kind: Kind,
                        lo: Long = 0L, hi: Long = 0L,
                        vals: Seq[String] = Nil) {
    def lowCard: Boolean =
      (kind == IntK && hi - lo <= 30) || (kind == StrK && vals.nonEmpty)
  }

  final case class FTable(name: String, cols: Seq[FCol])

  val nation = FTable("nation", Seq(
    FCol("n_nationkey", IntK, 0, 24),
    FCol("n_regionkey", IntK, 0, 4),
    FCol("n_name", StrK, vals = Seq("NATION_3", "NATION_12", "NATION_20"))))
  val customer = FTable("customer", Seq(
    FCol("c_custkey", IntK, 0, 1499),
    FCol("c_nationkey", IntK, 0, 24),
    FCol("c_mktsegment", StrK,
      vals = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY")),
    FCol("c_name", StrK)))
  val orders = FTable("orders", Seq(
    FCol("o_orderkey", IntK, 0, 14999),
    FCol("o_custkey", IntK, 0, 1499),
    FCol("o_orderstatus", StrK, vals = Seq("F", "O", "P")),
    FCol("o_orderpriority", StrK,
      vals = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW"))))
  val lineitem = FTable("lineitem", Seq(
    FCol("l_orderkey", IntK, 0, 14999),
    FCol("l_partkey", IntK, 0, 1999),
    FCol("l_suppkey", IntK, 0, 99),
    FCol("l_linenumber", IntK, 1, 7),
    FCol("l_returnflag", StrK, vals = Seq("A", "N", "R")),
    FCol("l_linestatus", StrK, vals = Seq("F", "O"))))
  val part = FTable("part", Seq(
    FCol("p_partkey", IntK, 0, 1999),
    FCol("p_size", IntK, 1, 50),
    FCol("p_brand", StrK, vals = Seq("Brand#3", "Brand#14", "Brand#22")),
    FCol("p_type", StrK,
      vals = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD")),
    FCol("p_name", StrK, vals = Seq("blue anvil", "red gear"))))
  val supplier = FTable("supplier", Seq(
    FCol("s_suppkey", IntK, 0, 99),
    FCol("s_nationkey", IntK, 0, 24),
    FCol("s_name", StrK)))

  val allTables = Seq(nation, customer, orders, lineitem, part, supplier)

  /** FK equi-join edges (left.col = right.col), all type-aligned. */
  final case class FJoin(l: FTable, lc: String, r: FTable, rc: String)
  val joins = Seq(
    FJoin(orders, "o_custkey", customer, "c_custkey"),
    FJoin(lineitem, "l_orderkey", orders, "o_orderkey"),
    FJoin(lineitem, "l_partkey", part, "p_partkey"),
    FJoin(lineitem, "l_suppkey", supplier, "s_suppkey"),
    FJoin(customer, "c_nationkey", nation, "n_nationkey"),
    FJoin(supplier, "s_nationkey", nation, "n_nationkey"))
  /** 3-table chains: the second edge joins a table already present. */
  val chains = Seq(
    Seq(joins(1), joins(0)), // lineitem ⋈ orders ⋈ customer
    Seq(joins(3), joins(5)), // lineitem ⋈ supplier ⋈ nation
    Seq(joins(0), joins(4))) // orders ⋈ customer ⋈ nation

  /** One generated query: the SQL string (Spark-SQL- and
    * DuckDB-parseable), the equivalent DataFrame plan, and the output
    * schema the digest folds over. */
  final case class FQuery(idx: Int, sql: String,
                          build: (SparkSession, String) => DataFrame,
                          outCols: Seq[(String, Kind)])

  /** Table override used by [[digestAll]]: each table is loaded once
    * through [[graft.ops.CacheScope]] and every digest leg reuses the
    * in-memory relation — without this the legs re-scan lineitem ~70
    * times between them. Individual [[FQuery.build]] calls outside
    * digestAll read the files directly. */
  @volatile private var shared: Map[String, DataFrame] = Map.empty

  private def load(s: SparkSession, dir: String, t: FTable): DataFrame =
    shared.getOrElse(t.name, graft.catalog.Tables.load(s, dir, t.name))

  // ---- predicate generation: (sql, Column) pairs built in lockstep

  private def intPred(c: FCol, rnd: Random): (String, Column) = {
    rnd.nextInt(3) match {
      case 0 => // modular: scale-free selectivity
        val m = 2 + rnd.nextInt(6)
        val r = rnd.nextInt(m)
        (s"(${c.name} % $m) = $r", (col(c.name) % m) === r)
      case 1 =>
        val v = c.lo + (rnd.nextLong().abs % (c.hi - c.lo + 1))
        val (os, oc): (String, Column => Column) = rnd.nextInt(4) match {
          case 0 => ("<", _ < v); case 1 => ("<=", _ <= v)
          case 2 => (">", _ > v); case _ => (">=", _ >= v)
        }
        (s"${c.name} $os $v", oc(col(c.name)))
      case _ =>
        if (c.lowCard) {
          val v = c.lo + (rnd.nextLong().abs % (c.hi - c.lo + 1))
          if (rnd.nextBoolean()) (s"${c.name} = $v", col(c.name) === v)
          else (s"${c.name} <> $v", col(c.name) =!= v)
        } else {
          val v = c.lo + (rnd.nextLong().abs % (c.hi - c.lo + 1))
          (s"${c.name} >= $v", col(c.name) >= v)
        }
    }
  }

  private def strPred(c: FCol, rnd: Random): (String, Column) = {
    val v = c.vals(rnd.nextInt(c.vals.size))
    if (rnd.nextInt(3) == 0 && v.length >= 3) {
      val p = v.substring(0, 1 + rnd.nextInt(v.length - 1))
      (s"${c.name} LIKE '$p%'", col(c.name).like(s"$p%"))
    } else if (rnd.nextBoolean()) (s"${c.name} = '$v'", col(c.name) === v)
    else (s"${c.name} <> '$v'", col(c.name) =!= v)
  }

  private def onePred(cols: Seq[FCol], rnd: Random): (String, Column) = {
    val predable = cols.filter(c => c.kind == IntK || c.vals.nonEmpty)
    val c = predable(rnd.nextInt(predable.size))
    if (c.kind == IntK) intPred(c, rnd) else strPred(c, rnd)
  }

  private def wherePart(cols: Seq[FCol],
                        rnd: Random): Option[(String, Column)] =
    rnd.nextInt(4) match {
      case 0 => None
      case 1 => Some(onePred(cols, rnd))
      case _ =>
        val (s1, c1) = onePred(cols, rnd)
        val (s2, c2) = onePred(cols, rnd)
        if (rnd.nextInt(3) == 0) Some((s"($s1 OR $s2)", c1 || c2))
        else Some((s"$s1 AND $s2", c1 && c2))
    }

  // ---- source generation

  private final case class Source(sqlFrom: String,
                                  build: (SparkSession, String) => DataFrame,
                                  cols: Seq[FCol])

  private def source(rnd: Random): Source = rnd.nextInt(5) match {
    case 0 | 1 => // single table
      val t = allTables(rnd.nextInt(allTables.size))
      Source(t.name, (s, d) => load(s, d, t), t.cols)
    case 2 | 3 => // FK pair; 1-in-4 renders as LEFT JOIN. An FK edge
      // always matches (referential integrity), so half the LEFT legs
      // SHIFT the right key — lc = rc + shift — to manufacture real
      // unmatched rows: the null-introducing shape the digest's
      // NULL-coalesced terms and both engines' post-join WHERE
      // semantics are exercised by
      val j = joins(rnd.nextInt(joins.size))
      val left = rnd.nextInt(4) == 0
      val shift: Long =
        if (left && rnd.nextBoolean())
          (j.r.cols.find(_.name == j.rc).get.hi + 1) / 2
        else 0L
      val (kwSql, kwApi) = if (left) ("LEFT JOIN", "left") else ("JOIN", "inner")
      val onSql = if (shift == 0L) s"${j.lc} = ${j.rc}"
                  else s"${j.lc} = ${j.rc} + $shift"
      val onApi = if (shift == 0L) col(j.lc) === col(j.rc)
                  else col(j.lc) === col(j.rc) + shift
      Source(s"${j.l.name} $kwSql ${j.r.name} ON $onSql",
        (s, d) => load(s, d, j.l).join(load(s, d, j.r), onApi, kwApi),
        j.l.cols ++ j.r.cols)
    case _ => // 3-table chain
      val ch = chains(rnd.nextInt(chains.size))
      val Seq(j1, j2) = ch
      Source(
        s"${j1.l.name} JOIN ${j1.r.name} ON ${j1.lc} = ${j1.rc} " +
          s"JOIN ${j2.r.name} ON ${j2.lc} = ${j2.rc}",
        (s, d) => load(s, d, j1.l)
          .join(load(s, d, j1.r), col(j1.lc) === col(j1.rc))
          .join(load(s, d, j2.r), col(j2.lc) === col(j2.rc)),
        j1.l.cols ++ j1.r.cols ++ j2.r.cols)
  }

  private def pick[A](xs: Seq[A], n: Int, rnd: Random): Seq[A] =
    rnd.shuffle(xs.toList).take(n)

  // ---- whole-query generation

  def query(i: Int): FQuery = {
    val rnd = new Random(MasterSeed * 1000003L + i)
    if (i >= NumQueriesV4) return queryV5(i, rnd)
    if (i >= NumQueriesV3) return queryV4(i, rnd)
    if (i >= NumQueriesV2) return queryV3(i, rnd)
    val src = source(rnd)
    val where = wherePart(src.cols, rnd)
    val whereSql = where.map(w => s" WHERE ${w._1}").getOrElse("")
    def filtered(s: SparkSession, d: String): DataFrame = {
      val df = src.build(s, d)
      where.map(w => df.filter(w._2)).getOrElse(df)
    }

    rnd.nextInt(10) match {
      case k if k <= 4 => // grouped aggregation
        val gCands = src.cols.filter(_.lowCard)
        val gs = if (gCands.isEmpty) Nil
                 else pick(gCands, 1 + rnd.nextInt(2), rnd)
        val aggCands = src.cols.filterNot(c => gs.exists(_.name == c.name))
        val intAggs = pick(aggCands.filter(_.kind == IntK),
          1 + rnd.nextInt(2), rnd)
        val mmAggs = pick(aggCands, rnd.nextInt(2), rnd)
        val aggSql =
          Seq("CAST(count(*) AS BIGINT) AS cnt") ++
            intAggs.map(c =>
              s"CAST(sum(${c.name} % 1000003) AS BIGINT) AS s_${c.name}") ++
            mmAggs.map(c => s"min(${c.name}) AS mn_${c.name}")
        val aggApi: Seq[Column] =
          Seq(count(lit(1)).cast("long").as("cnt")) ++
            intAggs.map(c => sum(col(c.name) % 1000003L).cast("long")
              .as(s"s_${c.name}")) ++
            mmAggs.map(c => min(col(c.name)).as(s"mn_${c.name}"))
        val outCols =
          gs.map(c => (c.name, c.kind)) ++
            Seq(("cnt", IntK: Kind)) ++
            intAggs.map(c => (s"s_${c.name}", IntK: Kind)) ++
            mmAggs.map(c => (s"mn_${c.name}", c.kind))
        val gSql = if (gs.isEmpty) ""
                   else s" GROUP BY ${gs.map(_.name).mkString(", ")}"
        val sel = (gs.map(_.name) ++ aggSql).mkString(", ")
        val sql = s"SELECT $sel FROM ${src.sqlFrom}$whereSql$gSql"
        val build = (s: SparkSession, d: String) => {
          val f = filtered(s, d)
          val agged =
            if (gs.isEmpty) f.agg(aggApi.head, aggApi.tail: _*)
            else f.groupBy(gs.map(c => col(c.name)): _*)
              .agg(aggApi.head, aggApi.tail: _*)
          agged
        }
        FQuery(i, sql, build, outCols)

      case k if k <= 7 => // filtered projection (with arithmetic)
        val ints = src.cols.filter(_.kind == IntK)
        val base = pick(src.cols, 2 + rnd.nextInt(3), rnd)
        val arith: Option[(String, Column, String)] =
          if (ints.size >= 2 && rnd.nextBoolean()) {
            val Seq(a, b) = pick(ints, 2, rnd)
            if (rnd.nextBoolean())
              Some((s"${a.name} + ${b.name} AS x_arith",
                (col(a.name) + col(b.name)).as("x_arith"), "x_arith"))
            else
              Some((s"${a.name} * 3 - ${b.name} AS x_arith",
                (col(a.name) * 3 - col(b.name)).as("x_arith"), "x_arith"))
          } else None
        val selSql = (base.map(_.name) ++ arith.map(_._1)).mkString(", ")
        val sql = s"SELECT $selSql FROM ${src.sqlFrom}$whereSql"
        val build = (s: SparkSession, d: String) =>
          filtered(s, d).select(
            base.map(c => col(c.name)) ++ arith.map(_._2): _*)
        FQuery(i, sql, build,
          base.map(c => (c.name, c.kind)) ++
            arith.map(a => (a._3, IntK: Kind)))

      case _ => // DISTINCT projection over low-card columns
        val lc0 = src.cols.filter(_.lowCard)
        val lc = if (lc0.isEmpty) src.cols.take(1) else lc0
        val cs = pick(lc, math.min(lc.size, 1 + rnd.nextInt(2)), rnd)
        val sql = s"SELECT DISTINCT ${cs.map(_.name).mkString(", ")} " +
          s"FROM ${src.sqlFrom}$whereSql"
        val build = (s: SparkSession, d: String) =>
          filtered(s, d).select(cs.map(c => col(c.name)): _*).distinct()
        FQuery(i, sql, build, cs.map(c => (c.name, c.kind)))
    }
  }

  /** v3 shapes (indices ≥ [[NumQueriesV2]]): EXISTS/NOT EXISTS,
    * windows, top-k. Determinism argument per shape:
    *   - semi/anti: the retained multiset is a pure set predicate —
    *     no ordering involved;
    *   - row_number / lag / running sum: the window ORDER BY ends in
    *     the table's unique key ([[pks]]) ⇒ one total order;
    *   - rank over a NON-unique sort column: each row's rank depends
    *     only on the multiset of sort values in its partition (ties
    *     share a rank), so (pk, rank) is deterministic even though
    *     physical row order is not;
    *   - top-k: the unique-key tiebreak makes the retained SET (which
    *     is all the order-insensitive digest sees) deterministic.
    * The running-sum frame is written as explicit ROWS BETWEEN ... on
    * BOTH sides: Spark's default frame for an ordered window is
    * RANGE, which only coincides with ROWS because the order is
    * unique — the explicit frame removes the coincidence. */
  private def queryV3(i: Int, rnd: Random): FQuery = rnd.nextInt(3) match {
    case 0 => // EXISTS / NOT EXISTS → left-semi / left-anti
      val j = joins(rnd.nextInt(joins.size))
      val fromPk = rnd.nextBoolean() // outer = referenced side or FK side
      val (outer, inner, ok, ik) =
        if (fromPk) (j.r, j.l, j.rc, j.lc) else (j.l, j.r, j.lc, j.rc)
      val anti = rnd.nextInt(3) == 0
      val ip = onePred(inner.cols, rnd)
      val ow = wherePart(outer.cols, rnd)
      val proj = pick(outer.cols, 2, rnd)
      val ex0 = s"EXISTS (SELECT 1 FROM ${inner.name} " +
        s"WHERE $ik = $ok AND ${ip._1})"
      val exSql = if (anti) s"NOT $ex0" else ex0
      val whereSql = ow match {
        case Some((s0, _)) => s" WHERE $s0 AND $exSql"
        case None => s" WHERE $exSql"
      }
      val sql = s"SELECT ${proj.map(_.name).mkString(", ")} " +
        s"FROM ${outer.name}$whereSql"
      val build = (s: SparkSession, d: String) => {
        val o0 = load(s, d, outer)
        val o = ow.map(w => o0.filter(w._2)).getOrElse(o0)
        val in = load(s, d, inner).filter(ip._2).select(col(ik))
        o.join(in, col(ok) === col(ik),
            if (anti) "left_anti" else "left_semi")
          .select(proj.map(c => col(c.name)): _*)
      }
      FQuery(i, sql, build, proj.map(c => (c.name, c.kind)))

    case 1 => // window function over a single-pk table
      import org.apache.spark.sql.expressions.Window
      val singles = Seq(customer, orders, part, supplier)
      val t = singles(rnd.nextInt(singles.size))
      val pk = pks(t.name).head
      val gCands = t.cols.filter(c => c.lowCard && c.name != pk)
      val g = gCands(rnd.nextInt(gCands.size))
      val ow = wherePart(t.cols, rnd)
      val whereSql = ow.map(w => s" WHERE ${w._1}").getOrElse("")
      def filtered(s: SparkSession, d: String): DataFrame = {
        val df = load(s, d, t)
        ow.map(w => df.filter(w._2)).getOrElse(df)
      }
      val w = Window.partitionBy(col(g.name)).orderBy(col(pk))
      rnd.nextInt(4) match {
        case 0 => // row_number + top-k-per-group outer filter
          val k = 1 + rnd.nextInt(10)
          val sql = s"SELECT $pk, ${g.name}, rn FROM (SELECT $pk, " +
            s"${g.name}, row_number() OVER (PARTITION BY ${g.name} " +
            s"ORDER BY $pk) AS rn FROM ${t.name}$whereSql) WHERE rn <= $k"
          val build = (s: SparkSession, d: String) =>
            filtered(s, d).select(col(pk), col(g.name))
              .withColumn("rn", row_number().over(w))
              .filter(col("rn") <= k)
          FQuery(i, sql, build,
            Seq((pk, IntK: Kind), (g.name, g.kind), ("rn", IntK)))
        case 1 => // lag (NULL on each partition's first row)
          val sql = s"SELECT $pk, CAST(lag($pk, 1) OVER (PARTITION BY " +
            s"${g.name} ORDER BY $pk) AS BIGINT) AS lg " +
            s"FROM ${t.name}$whereSql"
          val build = (s: SparkSession, d: String) =>
            filtered(s, d).select(col(pk),
              lag(col(pk), 1).over(w).cast("long").as("lg"))
          FQuery(i, sql, build, Seq((pk, IntK: Kind), ("lg", IntK)))
        case 2 => // running sum, explicit ROWS frame
          val sql = s"SELECT $pk, CAST(sum($pk % 1000003) OVER " +
            s"(PARTITION BY ${g.name} ORDER BY $pk ROWS BETWEEN " +
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs " +
            s"FROM ${t.name}$whereSql"
          val build = (s: SparkSession, d: String) =>
            filtered(s, d).select(col(pk),
              sum(col(pk) % 1000003L)
                .over(w.rowsBetween(Window.unboundedPreceding,
                  Window.currentRow))
                .cast("long").as("rs"))
          FQuery(i, sql, build, Seq((pk, IntK: Kind), ("rs", IntK)))
        case _ => // rank over a NON-unique sort column
          val sCands = t.cols.filter(c =>
            c.kind == IntK && c.name != pk && c.name != g.name)
          val sc = if (sCands.isEmpty) g else sCands(rnd.nextInt(sCands.size))
          val wr = Window.partitionBy(col(g.name)).orderBy(col(sc.name))
          val sql = s"SELECT $pk, rank() OVER (PARTITION BY ${g.name} " +
            s"ORDER BY ${sc.name}) AS rk FROM ${t.name}$whereSql"
          val build = (s: SparkSession, d: String) =>
            filtered(s, d).select(col(pk),
              rank().over(wr).as("rk"))
          FQuery(i, sql, build, Seq((pk, IntK: Kind), ("rk", IntK)))
      }

    case _ => // ORDER BY + LIMIT top-k, unique-key tiebreak
      val t = allTables(rnd.nextInt(allTables.size))
      val pkCols = pks(t.name)
      val sCands = t.cols.filter(c =>
        c.kind == IntK && !pkCols.contains(c.name))
      val sc = if (sCands.isEmpty) t.cols.head
               else sCands(rnd.nextInt(sCands.size))
      val desc = rnd.nextBoolean()
      val k = 5 + rnd.nextInt(46)
      val ow = wherePart(t.cols, rnd)
      val whereSql = ow.map(w => s" WHERE ${w._1}").getOrElse("")
      val orderSql =
        ((sc.name + (if (desc) " DESC" else "")) +: pkCols).mkString(", ")
      val projCols = (sc.name +: pkCols).distinct
      val projKinds = projCols.map(n =>
        (n, t.cols.find(_.name == n).get.kind))
      val sql = s"SELECT ${projCols.mkString(", ")} FROM ${t.name}" +
        s"$whereSql ORDER BY $orderSql LIMIT $k"
      val build = (s: SparkSession, d: String) => {
        val df0 = load(s, d, t)
        val df = ow.map(w => df0.filter(w._2)).getOrElse(df0)
        val sortCols =
          (if (desc) col(sc.name).desc else col(sc.name).asc) +:
            pkCols.map(col(_).asc)
        df.select(projCols.map(col): _*)
          .orderBy(sortCols: _*).limit(k)
      }
      FQuery(i, sql, build, projKinds)
  }

  /** v4 shapes (indices ≥ [[NumQueriesV3]]). Dialect notes:
    *   - SQL `UNION` / `INTERSECT` / `EXCEPT` are DISTINCT in both
    *     engines; the API renders them as `.union(..).distinct()` /
    *     `.intersect` / `.except`;
    *   - scalar subqueries avoid division entirely (`max(pk) - δ`):
    *     int `/` yields a FLOAT in DuckDB but integer division in
    *     Spark — the one arithmetic operator the two dialects define
    *     differently, excluded the same way DOUBLE columns are;
    *   - NOT IN is only generated over non-null base columns with
    *     non-null literal lists, where it is exactly `NOT isin`;
    *   - a CASE branch may be NULL to exercise the digest's NULL
    *     sentinel on a non-join path. */
  // dispatch on i, NOT rnd.nextInt(4): java.util.Random's first draw
  // for a power-of-2 bound comes from the high bits, which are nearly
  // constant across the consecutive seeds this corpus uses — measured:
  // all 60 v4 indices collapsed onto one shape. i % 4 is uniform by
  // construction. (v3's nextInt(3) takes the modulo path over the low
  // bits, which is why its dispatch mixed fine.)
  private def queryV4(i: Int, rnd: Random): FQuery = (i % 4) match {
    case 0 => // CASE WHEN projection + IN/NOT IN predicate
      val t = allTables(rnd.nextInt(allTables.size))
      val ints = t.cols.filter(_.kind == IntK)
      val a = ints(rnd.nextInt(ints.size))
      val b = ints(rnd.nextInt(ints.size))
      val (ps, pc) = onePred(t.cols, rnd)
      val inCands = t.cols.filter(c =>
        (c.kind == IntK && c.lowCard) || c.vals.nonEmpty)
      val ic = inCands(rnd.nextInt(inCands.size))
      val neg = rnd.nextBoolean()
      val (inVals, inSql) = ic.kind match {
        case IntK =>
          val vs = (0 until 2 + rnd.nextInt(3))
            .map(_ => ic.lo + (rnd.nextLong().abs % (ic.hi - ic.lo + 1)))
            .distinct
          (vs.map(v => v: Any), vs.mkString(", "))
        case StrK =>
          val vs = pick(ic.vals, 1 + rnd.nextInt(2), rnd)
          (vs.map(v => v: Any), vs.map(v => s"'$v'").mkString(", "))
      }
      val inPredSql =
        s"${ic.name} ${if (neg) "NOT IN" else "IN"} ($inSql)"
      val inPredApi =
        if (neg) !col(ic.name).isin(inVals: _*)
        else col(ic.name).isin(inVals: _*)
      val nullBranch = rnd.nextInt(3) == 0
      val caseSql =
        if (nullBranch)
          s"CASE WHEN $ps THEN NULL ELSE ${a.name} % 97 END AS x_case"
        else s"CASE WHEN $ps THEN ${a.name} % 97 " +
          s"ELSE ${b.name} % 89 END AS x_case"
      val caseApi =
        (if (nullBranch) when(pc, lit(null).cast("long"))
           .otherwise(col(a.name) % 97)
         else when(pc, col(a.name) % 97).otherwise(col(b.name) % 89))
          .as("x_case")
      val proj = pick(t.cols, 2, rnd)
      val sql = s"SELECT ${proj.map(_.name).mkString(", ")}, $caseSql " +
        s"FROM ${t.name} WHERE $inPredSql"
      val build = (s: SparkSession, d: String) =>
        load(s, d, t).filter(inPredApi)
          .select(proj.map(c => col(c.name)) :+ caseApi: _*)
      FQuery(i, sql, build,
        proj.map(c => (c.name, c.kind)) :+ (("x_case", IntK: Kind)))

    case 1 => // HAVING over a grouped count (single/join/chain source)
      val src = source(rnd)
      val gCands = src.cols.filter(_.lowCard)
      val g = if (gCands.isEmpty) src.cols.head
              else gCands(rnd.nextInt(gCands.size))
      val ow = wherePart(src.cols, rnd)
      val whereSql = ow.map(w => s" WHERE ${w._1}").getOrElse("")
      val thresh = 1 + rnd.nextInt(20)
      val sql = s"SELECT ${g.name}, CAST(count(*) AS BIGINT) AS cnt " +
        s"FROM ${src.sqlFrom}$whereSql GROUP BY ${g.name} " +
        s"HAVING count(*) > $thresh"
      val build = (s: SparkSession, d: String) => {
        val df0 = src.build(s, d)
        val df = ow.map(w => df0.filter(w._2)).getOrElse(df0)
        df.groupBy(col(g.name))
          .agg(count(lit(1)).cast("long").as("cnt"))
          .filter(col("cnt") > thresh)
      }
      FQuery(i, sql, build, Seq((g.name, g.kind), ("cnt", IntK)))

    case 2 => // set operation between two filtered projections
      val t = allTables(rnd.nextInt(allTables.size))
      val lc0 = t.cols.filter(_.lowCard)
      val lc = if (lc0.isEmpty) t.cols.take(1) else lc0
      val gs = pick(lc, math.min(lc.size, 1 + rnd.nextInt(2)), rnd)
      val p1 = onePred(t.cols, rnd)
      val p2 = onePred(t.cols, rnd)
      val selSql = gs.map(_.name).mkString(", ")
      val (opSql, opApi): (String, (DataFrame, DataFrame) => DataFrame) =
        rnd.nextInt(3) match {
          case 0 => ("INTERSECT", (l, r) => l.intersect(r))
          case 1 => ("EXCEPT", (l, r) => l.except(r))
          case _ => ("UNION", (l, r) => l.union(r).distinct())
        }
      val sql = s"SELECT $selSql FROM ${t.name} WHERE ${p1._1} " +
        s"$opSql SELECT $selSql FROM ${t.name} WHERE ${p2._1}"
      val build = (s: SparkSession, d: String) => {
        val base = load(s, d, t)
        val sel = gs.map(c => col(c.name))
        opApi(base.filter(p1._2).select(sel: _*),
          base.filter(p2._2).select(sel: _*))
      }
      FQuery(i, sql, build, gs.map(c => (c.name, c.kind)))

    case _ => // scalar subquery threshold (broadcast 1-row cross join)
      val j = joins(rnd.nextInt(joins.size))
      val rPk = j.rc
      val rHi = j.r.cols.find(_.name == rPk).get.hi
      val delta = rnd.nextLong().abs % (rHi + 1)
      val hiSide = rnd.nextBoolean()
      val (cmpSql, scalarApi, cmpApi) =
        if (hiSide)
          (s"${j.lc} <= (SELECT max($rPk) - $delta FROM ${j.r.name})",
            (max(col(rPk)) - delta).as("__s"),
            (l: Column, s0: Column) => l <= s0)
        else
          (s"${j.lc} >= (SELECT min($rPk) + $delta FROM ${j.r.name})",
            (min(col(rPk)) + delta).as("__s"),
            (l: Column, s0: Column) => l >= s0)
      val ow = wherePart(j.l.cols, rnd)
      val whereSql = ow match {
        case Some((s0, _)) => s" WHERE $s0 AND $cmpSql"
        case None => s" WHERE $cmpSql"
      }
      val proj = pick(j.l.cols, 2, rnd)
      val sql = s"SELECT ${proj.map(_.name).mkString(", ")} " +
        s"FROM ${j.l.name}$whereSql"
      val build = (s: SparkSession, d: String) => {
        val l0 = load(s, d, j.l)
        val l = ow.map(w => l0.filter(w._2)).getOrElse(l0)
        val scalar = load(s, d, j.r).agg(scalarApi)
        l.crossJoin(broadcast(scalar))
          .filter(cmpApi(col(j.lc), col("__s")))
          .select(proj.map(c => col(c.name)): _*)
      }
      FQuery(i, sql, build, proj.map(c => (c.name, c.kind)))
  }

  /** v5 composite shapes (indices ≥ [[NumQueriesV4]]); i%4 dispatch
    * for the same power-of-2 first-draw reason as v4. */
  private def queryV5(i: Int, rnd: Random): FQuery = (i % 4) match {
    case 0 => // window over a JOIN source (FK side's pk stays unique)
      import org.apache.spark.sql.expressions.Window
      val j = joins(rnd.nextInt(joins.size))
      val pkCols = pks(j.l.name)
      val cols = j.l.cols ++ j.r.cols
      val gCands = cols.filter(c => c.lowCard && !pkCols.contains(c.name))
      val g = gCands(rnd.nextInt(gCands.size))
      val ow = wherePart(cols, rnd)
      val whereSql = ow.map(w => s" WHERE ${w._1}").getOrElse("")
      val w = Window.partitionBy(col(g.name))
        .orderBy(pkCols.map(col(_).asc): _*)
      val runSum = rnd.nextBoolean()
      val pkSql = pkCols.mkString(", ")
      val (wSql, wApi) =
        if (runSum)
          (s"CAST(sum(${pkCols.head} % 1000003) OVER (PARTITION BY " +
            s"${g.name} ORDER BY $pkSql ROWS BETWEEN UNBOUNDED " +
            "PRECEDING AND CURRENT ROW) AS BIGINT) AS wv",
            sum(col(pkCols.head) % 1000003L)
              .over(w.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).cast("long").as("wv"))
        else
          (s"CAST(row_number() OVER (PARTITION BY ${g.name} " +
            s"ORDER BY $pkSql) AS BIGINT) AS wv",
            row_number().over(w).cast("long").as("wv"))
      val sql = s"SELECT $pkSql, ${g.name}, $wSql " +
        s"FROM ${j.l.name} JOIN ${j.r.name} ON ${j.lc} = ${j.rc}$whereSql"
      val build = (s: SparkSession, d: String) => {
        val joined = load(s, d, j.l)
          .join(load(s, d, j.r), col(j.lc) === col(j.rc))
        val f = ow.map(wp => joined.filter(wp._2)).getOrElse(joined)
        f.select(pkCols.map(col) ++ Seq(col(g.name), wApi): _*)
      }
      FQuery(i, sql, build,
        pkCols.map(n => (n, IntK: Kind)) ++
          Seq((g.name, g.kind), ("wv", IntK)))

    case 1 => // grouped aggregation over an EXISTS-filtered source
      val j = joins(rnd.nextInt(joins.size))
      val fromPk = rnd.nextBoolean()
      val (outer, inner, ok, ik) =
        if (fromPk) (j.r, j.l, j.rc, j.lc) else (j.l, j.r, j.lc, j.rc)
      val anti = rnd.nextInt(3) == 0
      val ip = onePred(inner.cols, rnd)
      val gCands = outer.cols.filter(_.lowCard)
      val g = if (gCands.isEmpty) outer.cols.head
              else gCands(rnd.nextInt(gCands.size))
      val sCands = outer.cols.filter(c =>
        c.kind == IntK && c.name != g.name)
      val sc = sCands(rnd.nextInt(sCands.size))
      val ex0 = s"EXISTS (SELECT 1 FROM ${inner.name} " +
        s"WHERE $ik = $ok AND ${ip._1})"
      val exSql = if (anti) s"NOT $ex0" else ex0
      val sql = s"SELECT ${g.name}, CAST(count(*) AS BIGINT) AS cnt, " +
        s"CAST(sum(${sc.name} % 1000003) AS BIGINT) AS sv " +
        s"FROM ${outer.name} WHERE $exSql GROUP BY ${g.name}"
      val build = (s: SparkSession, d: String) => {
        val in = load(s, d, inner).filter(ip._2).select(col(ik))
        load(s, d, outer)
          .join(in, col(ok) === col(ik),
            if (anti) "left_anti" else "left_semi")
          .groupBy(col(g.name))
          .agg(count(lit(1)).cast("long").as("cnt"),
            sum(col(sc.name) % 1000003L).cast("long").as("sv"))
      }
      FQuery(i, sql, build,
        Seq((g.name, g.kind), ("cnt", IntK), ("sv", IntK)))

    case 2 => // top-k over a JOIN (unique tiebreak = FK side's key)
      val j = joins(rnd.nextInt(joins.size))
      val pkCols = pks(j.l.name)
      val cols = j.l.cols ++ j.r.cols
      val sCands = cols.filter(c =>
        c.kind == IntK && !pkCols.contains(c.name))
      val sc = sCands(rnd.nextInt(sCands.size))
      val desc = rnd.nextBoolean()
      val k = 5 + rnd.nextInt(46)
      val ow = wherePart(cols, rnd)
      val whereSql = ow.map(w => s" WHERE ${w._1}").getOrElse("")
      val projCols = (sc.name +: pkCols).distinct
      val projKinds = projCols.map(n =>
        (n, cols.find(_.name == n).get.kind))
      val orderSql =
        ((sc.name + (if (desc) " DESC" else "")) +: pkCols).mkString(", ")
      val sql = s"SELECT ${projCols.mkString(", ")} FROM ${j.l.name} " +
        s"JOIN ${j.r.name} ON ${j.lc} = ${j.rc}$whereSql " +
        s"ORDER BY $orderSql LIMIT $k"
      val build = (s: SparkSession, d: String) => {
        val joined = load(s, d, j.l)
          .join(load(s, d, j.r), col(j.lc) === col(j.rc))
        val f = ow.map(wp => joined.filter(wp._2)).getOrElse(joined)
        val sortCols =
          (if (desc) col(sc.name).desc else col(sc.name).asc) +:
            pkCols.map(col(_).asc)
        f.select(projCols.map(col): _*).orderBy(sortCols: _*).limit(k)
      }
      FQuery(i, sql, build, projKinds)

    case _ => // lag over an EXISTS-filtered single-pk table
      import org.apache.spark.sql.expressions.Window
      val semiJoins = joins.filter(j => pks(j.r.name).size == 1)
      val j = semiJoins(rnd.nextInt(semiJoins.size))
      val (outer, inner, ok, ik) = (j.r, j.l, j.rc, j.lc)
      val pk = pks(outer.name).head
      val ip = onePred(inner.cols, rnd)
      val gCands = outer.cols.filter(c => c.lowCard && c.name != pk)
      val g = gCands(rnd.nextInt(gCands.size))
      val sql = s"SELECT $pk, CAST(lag($pk, 1) OVER (PARTITION BY " +
        s"${g.name} ORDER BY $pk) AS BIGINT) AS lg FROM ${outer.name} " +
        s"WHERE EXISTS (SELECT 1 FROM ${inner.name} " +
        s"WHERE $ik = $ok AND ${ip._1})"
      val w = Window.partitionBy(col(g.name)).orderBy(col(pk))
      val build = (s: SparkSession, d: String) => {
        val in = load(s, d, inner).filter(ip._2).select(col(ik))
        load(s, d, outer)
          .join(in, col(ok) === col(ik), "left_semi")
          .select(col(pk), lag(col(pk), 1).over(w).cast("long").as("lg"))
      }
      FQuery(i, sql, build, Seq((pk, IntK: Kind), ("lg", IntK)))
  }

  def corpus: Seq[FQuery] = (0 until NumQueries).map(query)

  // ---- digests: one (q, n_rows, chk) row per query, both renderings

  /** Row-wise digest expression over a query's OUTPUT columns: ints
    * contribute (v % 1000003), strings their length, each weighted by
    * 1-based position so column swaps change the digest. Bounded so
    * BIGINT never overflows at any harness SF. */
  private def chkApi(outCols: Seq[(String, Kind)]): Column =
    outCols.zipWithIndex.map { case ((n, k), j) =>
      val v = k match {
        case IntK => col(n).cast("long") % 1000003L
        case StrK => length(col(n)).cast("long")
      }
      // NULLs (outer-join padding) digest as a sentinel instead of
      // nulling the whole row's term out of the sum
      coalesce(v, lit(-7L)) * (j + 1).toLong
    }.reduce(_ + _)

  private def chkSql(outCols: Seq[(String, Kind)]): String =
    outCols.zipWithIndex.map { case ((n, k), j) =>
      val v = k match {
        case IntK => s"(CAST($n AS BIGINT) % 1000003)"
        case StrK => s"CAST(length($n) AS BIGINT)"
      }
      s"coalesce($v, -7) * ${j + 1}"
    }.mkString(" + ")

  /** The gate's Spark side: every corpus query reduced to one
    * (q, n_rows, chk) digest row. EAGER by design: a 120-leg union in
    * one plan spends ~35 s in per-stage adaptive re-planning alone
    * (measured, data-size-independent — sf0.001 ≈ sf0.1), so instead
    * each leg runs as its own small job, 16 concurrently from the
    * driver, over tables cached ONCE (pruned to the fuzz columns —
    * caching the full width would defeat the column pruning a direct
    * scan gets for free). The assembled result is 120 local rows —
    * the digests, not the data, cross the driver boundary. */
  def digestAll(s: SparkSession, dir: String): DataFrame = {
    shared = allTables.map(t => t.name ->
      graft.ops.CacheScope.persist(
        graft.catalog.Tables.load(s, dir, t.name)
          .select(t.cols.map(c => col(c.name)): _*))).toMap
    def legOf(q: FQuery): DataFrame =
      q.build(s, dir).agg(
          count(lit(1)).cast("long").as("n_rows"),
          coalesce(sum(chkApi(q.outCols)), lit(0L)).cast("long").as("chk"))
        .select(lit(q.idx).as("q"), col("n_rows"), col("chk"))
    // per-leg adaptive re-planning is the dominant cost at ANY data
    // size (in-JVM A/B, sf0.1: concurrent+AQE-off 14.4 s vs 21 s with
    // AQE, vs 31-57 s as one union plan) — each leg is a known-tiny
    // 2-4 stage job, so static planning with few shuffle partitions
    // wins; the session conf is restored after the scope.
    // r19 re-A/B at 180 legs (Bench subset, sf0.1, min-of-2): this
    // shape 18.0 s; pool 16→32 WORSE (20.5 s); small per-job unions
    // of 4/8/16 legs a wash (19.0/17.7/19.9 s) — the ~50 ms/leg/pass
    // floor is scheduler time the driver cannot amortize further, so
    // the simple one-leg-per-job form stays.
    // r19: DataFrame CONSTRUCTION (Dataset analysis is eager) moved
    // inside the pool too — building 288 legs serially on the main
    // thread before any collect was itself seconds of single-threaded
    // driver work (measured: the warm uncached seq-build alone read
    // tens of ms per leg); now each future builds AND collects its
    // leg, so analysis overlaps execution across the pool. `shared`
    // must outlive every future, hence the clear moved after the Await.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    // corpus is a strict def (288 FQuery builds); bind it ONCE and
    // reuse for the schema leg and the fan-out (r19 advice: the
    // previous corpus.head + corpus.map re-ran construction 2x).
    val qs = corpus
    val schemaLeg = legOf(qs.head)
    // r20 A/B (warm pass, the min-of-2-visible one): shuffle
    // partitions 1 vs 8 and wholeStage codegen on vs off are all
    // within noise (5.5-6.2 s / 288 legs); codegen OFF cuts only the
    // cold pass (20 -> 15 s). The warm floor is driver job-submission
    // throughput (~19 ms/leg incl. planning), so the simple shape
    // stays.
    val rows = try ConfScope.withScopedConf(s,
      Seq("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8")) {
      Await.result(
        Future.sequence(qs.map(q => Future(legOf(q).collect()(0)))),
        scala.concurrent.duration.Duration.Inf)
    } finally { pool.shutdown(); shared = Map.empty }
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schemaLeg.schema).orderBy("q")
  }

  /** The gate's oracle: the same digests via DuckDB SQL. */
  def digestAllSql: String =
    corpus.map { q =>
      s"SELECT ${q.idx} AS q, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"CAST(coalesce(sum(${chkSql(q.outCols)}), 0) AS BIGINT) AS chk " +
        s"FROM (${q.sql})"
    }.mkString("", " UNION ALL ", " ORDER BY q")
}
