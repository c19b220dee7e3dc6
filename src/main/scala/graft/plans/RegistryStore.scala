package graft.plans

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.catalog.SnapshotManifest

/** DURABLE rule registries. [[MvCatalog]]/[[FkCatalog]]/[[PkCatalog]]
  * are JVM-wide TrieMaps — good enough inside one driver, but a NEW
  * driver (cluster job restart, a Thrift/Connect server picking the
  * rules up via `spark.sql.extensions=graft.GraftExtensions`) starts
  * with every catalog empty and silently loses every rewrite: queries
  * stay correct but quietly repay the fact scans, joins, and shuffles
  * the declarations had eliminated. The cure is the same pointer
  * pattern every other durable artifact here uses (IndexIo, the
  * snapshot log): declarations serialize to a versioned JSON file
  * beside a `_latest` pointer, atomically flipped, pruned to the last
  * two versions.
  *
  *   - Set `graft.registry.path` on the session (or in
  *     `spark-defaults`) and every declaration — [[Mv.build]]/
  *     [[Mv.buildJoin]], both refreshes, [[JoinElim.declareVerified]],
  *     [[DistinctElim.declareUniqueKey]] — WRITES THROUGH to the
  *     store; each rewrite rule lazily [[ensureLoaded]]s the store on
  *     its first planning pass, so a fresh driver rebuilds all three
  *     catalogs from one small file read before the first rewrite
  *     decision.
  *   - The [[TableState]] fp stamps persist VERBATIM: a table that
  *     moved while no driver was running fails the plan-time
  *     fingerprint check after reload exactly as it would have live —
  *     durability does not weaken the staleness contract.
  *   - Without the conf the registries stay session-scoped, the
  *     pre-r12 behavior.
  *
  * Single-writer per registry path (the declaring driver), the same
  * contract as every maintenance op here; readers only ever see a
  * complete pointed-to version. */
object RegistryStore {

  val ConfKey = "graft.registry.path"

  /** Paths already loaded in this JVM — loading is idempotent and
    * cheap, but planning runs per query and must not re-read. */
  private val loaded = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private[graft] def resetForTest(): Unit = loaded.clear()

  private def confPath(spark: SparkSession): Option[String] =
    spark.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty)

  /** Write-through hook for declaration sites: persist the current
    * catalogs iff the session opts in via `graft.registry.path`.
    * LOADS FIRST: a fresh driver whose first action is a declaration
    * (no query planned yet, so the rules' lazy load never ran) would
    * otherwise serialize only its own new def and atomically replace
    * the store — silently destroying every previously persisted
    * declaration. Loading merges the persisted defs into the live
    * catalogs before the snapshot is written. */
  def autoPersist(spark: SparkSession): Unit =
    confPath(spark).foreach { dir =>
      loaded.getOrElseUpdate(dir, { load(spark, dir); true })
      persist(spark, dir)
    }

  /** The revocation path: `exclude` names the defs being revoked, so
    * the CAS loop's fill-gaps merge cannot resurrect exactly the def
    * being withdrawn (revocation is authoritative — it wins even over
    * a concurrent re-declaration of the same name). Callers must
    * [[ensureLoaded]] BEFORE the unregister (the revoke APIs do), so
    * the snapshot written here is the full store minus the revoked
    * names. */
  private[plans] def writeThrough(spark: SparkSession,
                                  exclude: Set[String] = Set.empty): Unit =
    confPath(spark).foreach { dir =>
      loaded.put(dir, true) // this JVM's view is now the truth
      persist(spark, dir, exclude)
    }

  /** Rule-side hook: load the store once per JVM per path, BEFORE the
    * catalogs' isEmpty short-circuit, so a fresh driver's first query
    * already plans with the persisted declarations. */
  def ensureLoaded(spark: SparkSession): Unit =
    confPath(spark).foreach { dir =>
      loaded.getOrElseUpdate(dir, { load(spark, dir); true })
    }

  /** Test hook — runs a thunk at a named point inside [[persist]]
    * (the [[graft.catalog.Layout.testInterleave]] pattern): lets a
    * spec interleave a concurrent writer inside the stage→flip window
    * to pin the CAS retry. Self-clearing so the thunk's own persist
    * does not recurse. */
  @volatile private[graft] var testInterleave: Option[(String, () => Unit)] =
    None
  private def interleave(name: String): Unit = testInterleave match {
    case Some((n, thunk)) if n == name =>
      testInterleave = None
      thunk()
    case _ => ()
  }

  /** Serialize all three catalogs to `dir` (versioned file + `_latest`
    * flip + keep-last-2 prune).
    *
    * CONCURRENCY-SAFE: the flip is a compare-and-swap against the
    * pointer observed at entry ([[SnapshotManifest.casFlip]], under
    * the directory's commit lock). Two drivers declaring at once can
    * no longer last-writer-win the whole store: the loser re-reads the
    * winner's version, MERGES it into the live catalogs (fill-gaps —
    * its own fresh declarations win by name), re-serializes, and
    * retries with a fresh version file; bounded attempts, then a loud
    * failure naming the directory. `exclude` suppresses the merge for
    * names being revoked (see [[writeThrough]]). */
  def persist(spark: SparkSession, dir: String,
              exclude: Set[String] = Set.empty): Unit = {
    val fs = SnapshotManifest.fsOf(spark, dir)
    fs.mkdirs(new Path(dir))
    var attempts = 0
    while (attempts < 5) {
      val expected = SnapshotManifest.currentSnap(spark, dir)
      // merge any defs a concurrent driver persisted since our last
      // read — one small file read; live (newer) defs win by name
      loadExcluding(spark, dir, exclude)
      val name = stageVersion(spark, dir)
      interleave("registry-before-flip")
      if (SnapshotManifest.casFlip(spark, dir, name, expected)) {
        prune(fs, dir, name)
        return
      }
      // lost the race: discard the staged file, re-merge, retry
      fs.delete(new Path(dir, name), false)
      attempts += 1
    }
    throw new IllegalStateException(
      s"registry persist at $dir: lost the concurrent-commit race " +
        s"$attempts times — a writer is flipping the pointer in a " +
        "tight loop; serialize declaring drivers or retry later")
  }

  /** Write the current catalogs as a fresh immutable version file
    * (temp + rename); returns its name. No pointer is touched. */
  private def stageVersion(spark: SparkSession, dir: String): String = {
    val fs = SnapshotManifest.fsOf(spark, dir)
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("version", 1)
    val mvs = root.putArray("mvs")
    MvCatalog.all.foreach { d =>
      val o = mvs.addObject()
      o.put("name", d.name); o.put("mvPath", d.mvPath); o.put("fp", d.fp)
      o.putPOJO("basePaths", d.basePaths.toSeq.sorted.asJava)
      o.putPOJO("dims", d.dims.asJava)
      o.putPOJO("measures", d.measures.toSeq.sorted.asJava)
      o.putPOJO("mins", d.mins.toSeq.sorted.asJava)
      o.putPOJO("maxs", d.maxs.toSeq.sorted.asJava)
      if (d.distincts.nonEmpty)
        o.putPOJO("distincts", d.distincts.toSeq.sorted.asJava)
      d.where.foreach(o.put("where", _))
      if (d.joins.nonEmpty) {
        val ja = o.putArray("joins")
        d.joins.foreach { j =>
          val jo = ja.addObject()
          jo.putPOJO("dimPaths", j.dimPaths.toSeq.sorted.asJava)
          jo.putPOJO("factKeys", j.factKeys.asJava)
          jo.putPOJO("dimKeys", j.dimKeys.asJava)
          if (j.preserving) jo.put("preserving", true)
        }
      }
    }
    val fks = root.putArray("fks")
    FkCatalog.all.foreach { d =>
      val o = fks.addObject()
      o.put("name", d.name); o.put("fp", d.fp)
      o.putPOJO("childPaths", d.childPaths.toSeq.sorted.asJava)
      o.putPOJO("childKeys", d.childKeys.asJava)
      o.putPOJO("parentPaths", d.parentPaths.toSeq.sorted.asJava)
      o.putPOJO("parentKeys", d.parentKeys.asJava)
    }
    val pks = root.putArray("pks")
    PkCatalog.all.foreach { d =>
      val o = pks.addObject()
      o.put("name", d.name); o.put("fp", d.fp)
      o.putPOJO("paths", d.paths.toSeq.sorted.asJava)
      o.putPOJO("keys", d.keys.asJava)
    }
    // SnapshotManifest.token: wall-clock-ordered and sign-safe, so
    // the keep-last-2 prune's lexicographic sort is the commit order
    val name = "reg_" + SnapshotManifest.token() + ".json"
    val tmp = new Path(dir, s".tmp_$name")
    val out = fs.create(tmp, true)
    try out.write(m.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, name)))
      throw new java.io.IOException(s"registry persist: rename failed: $name")
    name
  }

  /** keep-last-2: the current version plus one predecessor for
    * in-flight readers; older files are reclaimed. */
  private def prune(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                    name: String): Unit = {
    val keep = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(n => n.startsWith("reg_") && n.endsWith(".json"))
      .sorted.takeRight(2).toSet + name
    fs.listStatus(new Path(dir)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("reg_") && n.endsWith(".json") && !keep.contains(n))
        fs.delete(st.getPath, false)
    }
  }

  /** Register every persisted declaration into the live catalogs.
    * FILL-GAPS ONLY: a name already registered in memory wins — the
    * live def is always at least as new as the store's (every
    * declaration writes through), and a load racing a just-completed
    * refresh must not resurrect the superseded version (stale mvPath,
    * stale fp). No-op (not an error) when the store has no pointer
    * yet. */
  def load(spark: SparkSession, dir: String): Unit =
    loadExcluding(spark, dir, Set.empty)

  /** [[load]] skipping `exclude` — the CAS retry path of a revoking
    * [[writeThrough]] must not re-register the very defs being
    * withdrawn from a concurrent winner's version. */
  private def loadExcluding(spark: SparkSession, dir: String,
                            exclude: Set[String]): Unit = {
    val name = SnapshotManifest.currentSnap(spark, dir).getOrElse(return)
    val fs = SnapshotManifest.fsOf(spark, dir)
    val in = fs.open(new Path(dir, name))
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
    val root = new ObjectMapper().readTree(text)
    // validate the format BEFORE touching fields: a future-format or
    // hand-edited file must fail with a guided error naming the file,
    // not an opaque NullPointerException from an absent node
    val file = s"$dir/$name"
    def fail(why: String): Nothing = throw new IllegalStateException(
      s"registry store $file: $why — expected the version-1 format " +
        "persist() writes ({version:1, mvs:[...], fks:[...], pks:[...]}); " +
        "delete or repair the file (keep-last-2 retains the predecessor)")
    val ver = Option(root.get("version")).filter(_.isInt).map(_.asInt())
      .getOrElse(fail("missing or non-integer 'version' field"))
    if (ver != 1) fail(s"unsupported version $ver")
    def arr(f: String): Iterator[com.fasterxml.jackson.databind.JsonNode] =
      Option(root.get(f)).filter(_.isArray)
        .getOrElse(fail(s"missing or non-array '$f' field"))
        .elements().asScala
    def field(n: com.fasterxml.jackson.databind.JsonNode, f: String)
        : com.fasterxml.jackson.databind.JsonNode =
      Option(n.get(f)).getOrElse(fail(s"entry lacks required field '$f'"))
    def str(n: com.fasterxml.jackson.databind.JsonNode, f: String): String =
      field(n, f).asText()
    def strs(n: com.fasterxml.jackson.databind.JsonNode,
             f: String): Seq[String] =
      field(n, f).elements().asScala.map(_.asText()).toSeq
    arr("mvs").foreach { o =>
      def mvJoin(j: com.fasterxml.jackson.databind.JsonNode): MvJoin =
        MvJoin(strs(j, "dimPaths").toSet, strs(j, "factKeys"),
          strs(j, "dimKeys"),
          Option(j.get("preserving")).exists(_.asBoolean(false)))
      // `joins` array (current format); a single `join` object is the
      // pre-star-generalization spelling — still readable
      val joins = Option(o.get("joins")).filter(_.isArray)
        .map(_.elements().asScala.map(mvJoin).toSeq)
        .orElse(Option(o.get("join")).map(j => Seq(mvJoin(j))))
        .getOrElse(Nil)
      val d = MvDef(str(o, "name"),
        strs(o, "basePaths").toSet, str(o, "mvPath"),
        strs(o, "dims"), strs(o, "measures").toSet,
        strs(o, "mins").toSet, strs(o, "maxs").toSet, joins,
        str(o, "fp"),
        // absent in pre-distincts/pre-filtered files — defaults
        distincts = Option(o.get("distincts")).filter(_.isArray)
          .map(_.elements().asScala.map(_.asText()).toSet)
          .getOrElse(Set.empty),
        where = Option(o.get("where")).filter(_.isTextual).map(_.asText()))
      if (!exclude(d.name) && MvCatalog.get(d.name).isEmpty)
        MvCatalog.register(d)
    }
    arr("fks").foreach { o =>
      val d = FkDef(str(o, "name"),
        strs(o, "childPaths").toSet, strs(o, "childKeys"),
        strs(o, "parentPaths").toSet, strs(o, "parentKeys"),
        str(o, "fp"))
      if (!exclude(d.name) && FkCatalog.get(d.name).isEmpty)
        FkCatalog.register(d)
    }
    arr("pks").foreach { o =>
      val d = UniqueKeyDef(str(o, "name"),
        strs(o, "paths").toSet, strs(o, "keys"), str(o, "fp"))
      if (!exclude(d.name) && PkCatalog.get(d.name).isEmpty)
        PkCatalog.register(d)
    }
  }
}
