package graft.analytics

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types._

import graft.catalog.SnapshotManifest
import graft.plans.TableState

/** QUERY RESULT REUSE — the Snowflake/BigQuery result-cache idea,
  * available two ways:
  *
  *   - PLANNER-PROBED (the real thing): [[ResultCache.install]] a
  *     [[ResultCacheRule]] on the session (cluster sessions get it via
  *     `spark.sql.extensions=graft.GraftExtensions`) and set
  *     `graft.resultcache.dir`; every deterministic file-backed
  *     AGGREGATE query is then served from the persisted cache
  *     automatically — no caller routing anywhere. A miss computes the
  *     aggregate once, publishes the (small) result, and the query
  *     itself reads the entry back.
  *   - CALLER-ROUTED: `ResultCache.through(df, dir)` for sessions that
  *     want per-query opt-in without a session conf.
  *
  * The cache key digests three things:
  *   - the CANONICALIZED plan rendered LOSSLESSLY — `treeString` with
  *     `maxFields = Int.MaxValue`, because the default rendering
  *     truncates argument lists at `spark.sql.debug.maxToStringFields`
  *     (25) and two queries differing only past the cutoff (a >25-col
  *     projection, a long IN list) would otherwise silently share one
  *     entry;
  *   - every file-scan ROOT PATH, explicitly — treeStrings elide
  *     relation internals, and two same-shaped queries over different
  *     tables must never collide;
  *   - the [[TableState]] fingerprint of every file-backed leaf — for
  *     snapshot-logged tables one O(1) pointer read per table, so a
  *     probe costs metadata only. Any commit to any input changes the
  *     fingerprint and therefore the key: stale entries are simply
  *     never hit again (reclaim them with [[vacuum]]).
  *
  * A dashboard's repeated aggregate over a 100 TB fact thus pays the
  * scan once per table state, and O(result) afterwards. The rule only
  * caches AGGREGATE-rooted plans — the small-result kind; a TB-sized
  * raw projection is never routed through the cache.
  *
  * Concurrency: compute lands in a `.tmp_*` staging dir, then ONE
  * atomic rename publishes it; a concurrent loser's rename is detected
  * (including Hadoop's rename-INTO-existing-dst nesting behavior), its
  * staging is deleted, and it reads the winner's entry — no torn
  * reads, no lock. The schema is persisted beside the data so
  * zero-row results (a parquet dir with no part files) read back
  * exactly.
  *
  * Caveat (same as every result cache): cached queries must be
  * DETERMINISTIC — the rule checks this; `through` callers opt in per
  * query.
  *
  * ==Plan inspection triggers the compute==
  * While `graft.resultcache.dir` is set, a MISS is materialized from
  * INSIDE logical optimization — that is what lets the very first run
  * of a query be served from its own entry with zero caller routing.
  * The flip side: `df.explain()`, `queryExecution.optimizedPlan`, and
  * any plan-walking tooling optimize the plan and therefore COMPUTE
  * the aggregate and write the entry as a side effect. For
  * plan-inspection sessions set
  * `graft.resultcache.populateOnMiss=false`: the rule then rewrites
  * HITS only (explain is side-effect-free), misses compute normally,
  * and entries are born via [[through]] or a session with populate
  * left on. */
object ResultCache {

  /** Counts of cache misses (computes) and hits — observable by specs. */
  private[graft] val misses = new java.util.concurrent.atomic.AtomicLong
  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong

  /** Re-entrance guard: while a miss is being POPULATED from inside
    * the optimizer rule, the populate-write's own planning passes must
    * not probe the cache again. */
  private[analytics] val populating: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private[graft] def collectRoots(plan: LogicalPlan): Set[String] =
    orderedRoots(plan).flatten.toSet

  /** Per-leaf root paths in PLAN-TRAVERSAL (preorder) order — one
    * entry per LogicalRelation, ordered as the relations appear in the
    * tree. The key must use THIS, not an unordered set: the
    * canonicalized treeString erases attribute names and renders every
    * parquet scan identically, so two MIRRORED joins over
    * type-identical tables (A JOIN B vs B JOIN A, each aggregating its
    * left side) produce the same canonical tree and the same root SET
    * - only each relation's tree POSITION distinguishes them. Preorder
    * over the original plan matches the canonical tree's shape
    * (canonicalization rewrites expressions, never moves children). */
  private[graft] def orderedRoots(plan: LogicalPlan): Seq[Seq[String]] =
    plan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString).toSeq
        case _ => Seq.empty[String]
      }
    }

  /** Digest of (lossless canonical plan, per-leaf scan roots in tree
    * order, input-table fingerprints). */
  private[graft] def planKey(spark: SparkSession, plan: LogicalPlan): String = {
    val leafRoots = orderedRoots(plan)
    val roots = leafRoots.flatten.toSet
    val fp = if (roots.isEmpty) ""
      else TableState.fingerprint(spark, roots)
    // maxFields = MaxValue: the default treeString truncates at
    // spark.sql.debug.maxToStringFields and would alias distinct plans
    val tree = plan.canonicalized.treeString(
      verbose = true, addSuffix = false, maxFields = Int.MaxValue,
      printOperatorId = false)
    md5(tree + "\u0000" + leafRoots.map(_.mkString(",")).mkString(";") +
      "\u0000" + fp)
  }

  private[graft] def key(df: DataFrame): String =
    planKey(df.sparkSession, df.queryExecution.optimizedPlan)

  private[analytics] def entryDir(cacheDir: String, k: String): Path =
    new Path(cacheDir, s"res_$k")

  private[analytics] def readEntry(spark: SparkSession, fs: FileSystem,
                                   dir: Path): DataFrame = {
    val in = fs.open(new Path(dir, "_schema.json"))
    val schema = try DataType.fromJson(
      new String(in.readAllBytes(), StandardCharsets.UTF_8))
      .asInstanceOf[StructType]
    finally in.close()
    spark.read.schema(schema).parquet(dir.toString)
  }

  /** Publish a fully-written staging dir as the cache entry with one
    * atomic rename; on any lost race the staging data is dropped and
    * the winner's entry stands. Hadoop `rename(src, dst)` with an
    * EXISTING dst directory moves src INTO dst instead of failing —
    * the loser's "successful" rename would nest its staging inside the
    * winner's entry and leak a full result copy (dot-prefixed, so
    * reads are unaffected, but it sits there until vacuum). Detect the
    * nesting and delete it. */
  private[analytics] def publish(fs: FileSystem, tmp: Path, dir: Path): Unit = {
    fs.mkdirs(dir.getParent)
    if (fs.exists(dir) || !fs.rename(tmp, dir)) {
      fs.delete(tmp, true) // lost: winner's entry stands
      return
    }
    val nested = new Path(dir, tmp.getName)
    if (fs.exists(nested)) fs.delete(nested, true) // rename nested us: lost
  }

  /** Count of oversize results declined by the size guard. */
  private[graft] val oversized = new java.util.concurrent.atomic.AtomicLong

  /** Marker inside an entry dir recording "this key's result exceeds
    * the size cap — compute it for real, and do NOT re-materialize it
    * on every run". Without the negative entry an oversize aggregate
    * would pay a full result WRITE on each execution, strictly worse
    * than no cache. */
  private[analytics] def tooLargeMarker(dir: Path): Path =
    new Path(dir, "_toolarge")

  /** Compute `df` into a staging dir beside `dir` and publish it.
    * Returns false when the materialized result exceeds `maxBytes` —
    * the staging is dropped and a negative entry is recorded instead:
    * the Aggregate-root heuristic is a SMALL-RESULT bet, and a
    * GROUP BY on a near-unique column is a table-sized result that
    * must never occupy the cache (or be re-written per run). */
  private[analytics] def populate(df: DataFrame, fs: FileSystem,
                                  cacheDir: String, k: String, dir: Path,
                                  maxBytes: Long = Long.MaxValue): Boolean = {
    misses.incrementAndGet()
    val tmp = new Path(cacheDir, s".tmp_res_${k}_${SnapshotManifest.token()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (maxBytes < Long.MaxValue &&
        fs.getContentSummary(tmp).getLength > maxBytes) {
      oversized.incrementAndGet()
      fs.delete(tmp, true)
      fs.mkdirs(dir)
      val m = fs.create(tooLargeMarker(dir), true)
      try m.write(Array.emptyByteArray) finally m.close()
      return false
    }
    val out = fs.create(new Path(tmp, "_schema.json"), true)
    try out.write(df.schema.json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    publish(fs, tmp, dir)
    true
  }

  /** Serve `df`'s result from the cache at `cacheDir`, computing and
    * publishing it on a miss. The returned frame scans ONLY the cache
    * entry — the inputs are untouched on a hit. */
  def through(df: DataFrame, cacheDir: String): DataFrame = {
    val spark = df.sparkSession
    val fs = SnapshotManifest.fsOf(spark, cacheDir)
    // already cache-served: when the SESSION RULE is installed and the
    // conf points at this same dir, df's optimized plan is the rule's
    // rewrite — its scans point INTO cacheDir. Keying THAT plan would
    // miss (different tree) and write a duplicate entry whose contents
    // are a copy of the rule's entry. Short-circuit instead.
    // makeQualified: a relative cacheDir must still match the plan's
    // absolute roots; the "/"-terminated prefix keeps a SIBLING path
    // that merely string-prefixes cacheDir ("/data/rc" vs
    // "/data/rc_tables") from being misread as cache-served
    val cachePath = fs.makeQualified(new Path(cacheDir)).toUri.getPath
    val served = collectRoots(df.queryExecution.optimizedPlan)
    if (served.nonEmpty && served.forall { r =>
        val p = new Path(r).toUri.getPath
        p == cachePath || p.startsWith(cachePath + "/")
      })
      return df
    val k = key(df)
    val dir = entryDir(cacheDir, k)
    if (fs.exists(new Path(dir, "_schema.json"))) {
      hits.incrementAndGet()
      return readEntry(spark, fs, dir)
    }
    // a NEGATIVE entry (recorded by the rule's size guard) occupies
    // the same dir with no schema sidecar: compute for real — blindly
    // populating would lose the publish race to the marker dir and
    // then fail the read-back
    if (fs.exists(tooLargeMarker(dir))) return df
    populate(df, fs, cacheDir, k, dir)
    // belt and braces: if a racer recorded a negative entry between
    // the probe and the publish, fall back to the query itself
    if (fs.exists(new Path(dir, "_schema.json"))) readEntry(spark, fs, dir)
    else df
  }

  /** Idempotently install [[ResultCacheRule]] on a session (cluster
    * sessions get it via `spark.sql.extensions=graft.GraftExtensions`).
    * The rule stays a no-op until `graft.resultcache.dir` is set. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ResultCacheRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ResultCacheRule(spark)

  /** Reclaim entries older than `olderThanMs` (mtime of the entry
    * dir) plus any orphaned staging dirs. Writer-side, after a grace
    * period covering in-flight readers — the StatsCache/IndexIo
    * single-maintainer contract. Returns directories removed. */
  def vacuum(spark: org.apache.spark.sql.SparkSession, cacheDir: String,
             olderThanMs: Long): Int = {
    val fs = SnapshotManifest.fsOf(spark, cacheDir)
    val root = new Path(cacheDir)
    if (!fs.exists(root)) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    fs.listStatus(root).count { st =>
      val n = st.getPath.getName
      val stale = (n.startsWith("res_") || n.startsWith(".tmp_res_")) &&
        st.getModificationTime < cutoff
      if (stale) fs.delete(st.getPath, true)
      stale
    }
  }

  /** TOTAL-SIZE / LRU eviction — the companion [[vacuum]] (age-based)
    * lacks: entries are size-capped individually by the rule's
    * maxBytes guard, but `cacheDir` grows unboundedly across KEYS (a
    * dashboard fleet mints a fresh key per table commit, forever).
    * Evicts OLDEST-mtime first until the cumulative entry bytes fit
    * `maxTotalBytes`, plus orphaned staging dirs. Recency is the
    * entry dir's mtime — a write-once dir, so this is LRU over
    * CREATION (a re-hit entry is not refreshed; at one key per table
    * state that bias is harmless: superseded keys are precisely the
    * never-hit-again ones). Negative entries are near-zero-byte and
    * age out the same way.
    *
    * `graceMs` protects anything younger than the cutoff — staging
    * AND entries: a populate in flight (its `.tmp_*` not yet
    * published, or its entry just born and possibly mid-read by the
    * very query that wrote it) must never be deleted under it, and a
    * blind staging sweep could otherwise tear a concurrent populate
    * into a schema-only EMPTY entry. A young cache may therefore
    * stay over budget until entries age past the grace — the budget
    * is enforced eventually, never against in-flight work. Same
    * caveat as [[vacuum]] for old-but-hot entries: a reader planned
    * against an entry evicted mid-flight fails and recomputes on
    * retry; size the grace to cover expected read latency.
    * Writer-side, single-maintainer contract. Returns directories
    * removed. */
  def vacuumToSize(spark: org.apache.spark.sql.SparkSession,
                   cacheDir: String, maxTotalBytes: Long,
                   graceMs: Long = 15L * 60 * 1000): Int = {
    val fs = SnapshotManifest.fsOf(spark, cacheDir)
    val root = new Path(cacheDir)
    if (!fs.exists(root)) return 0
    val cutoff = System.currentTimeMillis() - graceMs
    val (staging, entries) = fs.listStatus(root).toSeq
      .filter(st => st.getPath.getName.startsWith("res_") ||
        st.getPath.getName.startsWith(".tmp_res_"))
      .partition(_.getPath.getName.startsWith(".tmp_res_"))
    val staleStaging = staging.filter(_.getModificationTime < cutoff)
    staleStaging.foreach(st => fs.delete(st.getPath, true))
    val sized = entries.sortBy(_.getModificationTime) // oldest first
      .map(st => (st, fs.getContentSummary(st.getPath).getLength))
    var total = sized.map(_._2).sum
    val evict = sized.filter { case (st, bytes) =>
      val doEvict = total > maxTotalBytes && st.getModificationTime < cutoff
      if (doEvict) total -= bytes
      doEvict
    }
    evict.foreach { case (st, _) => fs.delete(st.getPath, true) }
    staleStaging.size + evict.size
  }
}

/** PLANNER-PROBED result cache — the session rule that makes reuse
  * automatic (the Snowflake behavior): any root-level, deterministic,
  * file-backed AGGREGATE plan is keyed on
  * (lossless canonical plan, scan roots, table fingerprints) and
  * replaced by a scan of the persisted entry. A miss materializes the
  * entry right there (one compute, then the query reads it back), so
  * the SECOND run of any dashboard aggregate touches metadata + the
  * tiny result only.
  *
  * Scope discipline, all checked per plan:
  *   - ROOT only, with Sort/Limit wrappers kept OUTSIDE the entry (a
  *     parquet round-trip does not preserve order, so the original
  *     Sort re-sorts the small cached result — and asc/desc variants
  *     share one entry);
  *   - the stripped root must be an [[Aggregate]]: the small-result
  *     contract — never a TB projection; and because an Aggregate can
  *     still be table-sized (GROUP BY a near-unique column), a
  *     materialized result over `graft.resultcache.maxBytes`
  *     (default 256 MiB) is dropped and remembered as a NEGATIVE
  *     entry — computed for real forever after, never re-written;
  *   - every leaf a file scan (fingerprintable), no subqueries (their
  *     tables would escape the fingerprint), deterministic everywhere,
  *     distinct output names and parquet-writable types;
  *   - a thread-local guard keeps the populate-write's own planning
  *     from re-probing.
  *
  * No-op until `graft.resultcache.dir` is set on the session. */
case class ResultCacheRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val cacheDir = conf.getConfString("graft.resultcache.dir", "")
    if (cacheDir.isEmpty || ResultCache.populating.get()) plan
    else {
      val (inner, rebuild) = strip(plan)
      if (!cacheable(inner) || !siblingsStable(plan)) plan
      else try serve(inner, cacheDir).map(rebuild).getOrElse(plan)
      catch {
        // planning must never crash on cache trouble (unwritable dir,
        // torn entry …) — fall back to computing the query for real
        case scala.util.control.NonFatal(_) => plan
      }
    }
  }

  /** COMPOSE, don't race: the other graft rewrites (MV, join
    * elimination, distinct/aggregate elimination) share the fixed-point
    * batch but may sit AFTER this rule or only match once an earlier
    * rewrite exposes their pattern. Caching their INPUT would freeze
    * the worse plan under the entry key — and can silently break the
    * small-result contract (a GROUP BY on a verified-unique key is a
    * per-row result that aggregate elimination is about to unmask as a
    * bare projection). Defer until every sibling is at fixed point on
    * this plan; the batch re-runs this rule after they fire. Each
    * sibling no-ops in O(1) when its catalog is empty. */
  private lazy val mvSibling = graft.plans.MvRewriteRule(spark)
  private lazy val joinSibling = graft.plans.JoinElimRule(spark)
  private lazy val distinctSibling = graft.plans.DistinctElimRule(spark)

  private def siblingsStable(plan: LogicalPlan): Boolean =
    mvSibling(plan).fastEquals(plan) &&
      joinSibling(plan).fastEquals(plan) &&
      distinctSibling(plan).fastEquals(plan)

  /** Peel order/limit wrappers off the root, returning the inner plan
    * and a rebuilder that re-applies them over the substitute (exprIds
    * are preserved by [[remap]], so their references still bind).
    * Keying the UN-limited aggregate means all limit/order variants
    * share one entry; the flip side is that a limited query's first
    * run materializes the full aggregate result — acceptable because
    * the size guard's negative entry caps that waste at ONE occurrence
    * per key, and a group-by that is genuinely per-row gets unmasked
    * by the aggregate-elimination sibling before this rule fires.
    *
    * DECIDED (r19, after the r18 carry-over nit): the alternative —
    * materializing the LIMITED form when the limit is small — was
    * declined. A limited entry is only correct for its exact
    * (sort, limit) pair, so every ordering/limit variant of the same
    * dashboard aggregate would key (and pay for) its own entry, and
    * the un-limited probe that follows could never be served; the
    * shared un-limited entry serves ALL of them after one bounded
    * materialization. ResultCacheSpec pins the payoff: asc/desc/
    * different-limit/un-limited variants — one miss, one entry. */
  private def strip(p: LogicalPlan): (LogicalPlan, LogicalPlan => LogicalPlan) =
    p match {
      case s: Sort =>
        val (i, rb) = strip(s.child); (i, c => s.copy(child = rb(c)))
      case g: GlobalLimit =>
        val (i, rb) = strip(g.child); (i, c => g.copy(child = rb(c)))
      case l: LocalLimit =>
        val (i, rb) = strip(l.child); (i, c => l.copy(child = rb(c)))
      case other => (other, identity[LogicalPlan] _)
    }

  private def parquetSafe(dt: DataType): Boolean = dt match {
    case _: NumericType | _: StringType | BinaryType | BooleanType |
         DateType | TimestampType | TimestampNTZType => true
    case ArrayType(et, _) => parquetSafe(et)
    case MapType(k, v, _) => parquetSafe(k) && parquetSafe(v)
    case StructType(fields) => fields.forall(f => parquetSafe(f.dataType))
    case _ => false
  }

  private def cacheable(p: LogicalPlan): Boolean =
    p.isInstanceOf[Aggregate] &&
      p.subqueriesAll.isEmpty &&
      p.find(n => n.expressions.exists(e => !e.deterministic)).isEmpty && {
        val leaves = p.collectLeaves()
        leaves.nonEmpty && leaves.forall {
          case lr: LogicalRelation => lr.relation.isInstanceOf[HadoopFsRelation]
          case _ => false
        }
      } && {
        val names = p.output.map(_.name)
        names.distinct.size == names.size &&
          p.output.forall(a => parquetSafe(a.dataType))
      }

  private def serve(inner: LogicalPlan, cacheDir: String)
      : Option[LogicalPlan] = {
    val k = ResultCache.planKey(spark, inner)
    val dir = ResultCache.entryDir(cacheDir, k)
    val fs = SnapshotManifest.fsOf(spark, cacheDir)
    if (fs.exists(new Path(dir, "_schema.json"))) {
      ResultCache.hits.incrementAndGet()
      remap(inner, fs, dir)
    } else if (fs.exists(ResultCache.tooLargeMarker(dir))) {
      // negative entry: this key's result broke the size cap once —
      // compute for real, never re-materialize per run
      None
    } else if (conf.getConfString(
        "graft.resultcache.populateOnMiss", "true") != "true") {
      // hit-only mode: a miss stays a plain compute and plan
      // inspection (explain, optimizedPlan walks) has no side effects
      None
    } else {
      val maxBytes = conf
        .getConfString("graft.resultcache.maxBytes", "268435456").toLong
      ResultCache.populating.set(true)
      val kept =
        try ResultCache.populate(
          PlanBridge.ofRows(spark, inner), fs, cacheDir, k, dir, maxBytes)
        finally ResultCache.populating.set(false)
      // a lost race still reads the winner's identical entry
      if (kept && fs.exists(new Path(dir, "_schema.json")))
        remap(inner, fs, dir)
      else None
    }
  }

  /** Scan of the entry, output re-aliased POSITIONALLY to the original
    * root's names and exprIds so everything above (Sort/Limit wrappers,
    * the QueryExecution's schema) binds unchanged. Positional is exact:
    * the entry was written from this very plan's output. */
  private def remap(inner: LogicalPlan, fs: FileSystem, dir: Path)
      : Option[LogicalPlan] = {
    val rel = ResultCache.readEntry(spark, fs, dir)
      .queryExecution.analyzed
    if (rel.output.size != inner.output.size) return None
    Some(Project(inner.output.zip(rel.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, rel))
  }
}
