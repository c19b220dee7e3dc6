package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.catalog.SnapshotManifest

/** Table-state fingerprints for the constraint/MV rewrite registries.
  *
  * The "trust is earned" audits ([[JoinElim.declareVerified]],
  * [[DistinctElim.declareUniqueKey]]) and MV builds prove a property
  * of the table AS OF declaration time; nothing stops the table from
  * moving afterwards (`Layout.append`, a plain parquet append, a
  * compaction). A rewrite that still fires then returns silently
  * wrong answers — the worst failure mode an optimizer can have.
  * Every registry entry is therefore STAMPED with this fingerprint at
  * declaration, and each rule re-computes it at plan time, falling
  * through to the unrewritten plan on mismatch (correct, just
  * slower — re-declare after re-auditing to restore the rewrite).
  *
  * Fingerprint per root path, cheapest-available-evidence order:
  *   - a [[SnapshotManifest]]-logged table → `snap:<name>` from the
  *     `_latest` pointer — ONE tiny file read, the same token every
  *     maintenance op already CAS-commits against;
  *   - a plain directory → `ls:<files>:<bytes>:<maxMtime>` over its
  *     recursively listed data files (hidden `_`/`.` components
  *     skipped) — one listing, O(file count) metadata;
  *   - a single file → `f:<len>:<mtime>`.
  * Any append, delete, compact, or overwrite changes the value. The
  * check runs only AFTER a registry entry's path set has matched the
  * candidate plan, so queries that touch no registered table never
  * pay it.
  */
object TableState {

  /** Per-root fingerprint probes actually taken (each is a
    * getFileStatus + either one `_latest` read or one recursive
    * listing). Pinned by TableStateSpec: within ONE planning pass a
    * root is probed at most once however many candidate plan nodes
    * match it — the [[FpCache]] memo is what bounds plan-time cost
    * for plain-directory registrations (O(file count) per QUERY, not
    * per candidate Aggregate/Join). */
  private[graft] val probes = new java.util.concurrent.atomic.AtomicLong

  def fingerprint(spark: SparkSession, roots: Set[String]): String =
    roots.toSeq.sorted.map(one(spark, _)).mkString(";")

  /** Empty stamp = declared without staleness tracking (direct
    * registry writes, pre-stamp persisted defs): the caller owns
    * freshness, exactly the pre-r11 contract. */
  def matches(spark: SparkSession, stamped: String,
              roots: Set[String]): Boolean =
    stamped.isEmpty || stamped == fingerprint(spark, roots)

  /** Decompose a stamp back into its per-root segments (the stamp is
    * the sorted roots' segments ';'-joined) — what the incremental
    * re-verifiers need to recover WHICH snapshot a root was audited
    * at. None when the stamp is empty or was taken over a different
    * root set. */
  private[plans] def segments(stamped: String,
                              roots: Set[String]): Option[Map[String, String]] = {
    val rs = roots.toSeq.sorted
    val segs = stamped.split(";", -1).toSeq
    if (stamped.isEmpty || segs.length != rs.length) None
    else Some(rs.zip(segs).toMap)
  }

  /** The [[graft.catalog.Layout.changes]] feed for `(from → to]`,
    * guarded for the constraint registries' PLAIN-READ identity: the
    * audited "table" is `spark.read.parquet(root)`, which does NOT
    * apply deletion vectors — and `changes` NETS a same-window
    * insert+delete away, so a dv-carrying window could re-verify a
    * table whose plain read still contains the (logically deleted,
    * physically present) violating rows. Any `dv_*` part in the
    * window therefore refuses loudly; re-declare after a compaction
    * folds the vectors into clean files. */
  private[plans] def appendOnlyWindow(spark: SparkSession, root: String,
                                      from: String, to: String)
      : org.apache.spark.sql.DataFrame = {
    val before =
      try SnapshotManifest.partsOf(spark, root, from).toSet
      catch { case _: java.io.FileNotFoundException =>
        // same guided error changes() gives for its own reads: the
        // stamped snapshot aged out of keep-last-2 retention
        throw new IllegalStateException(s"window base snapshot $from " +
          s"at $root is unknown or expired (vacuum retention is " +
          "keep-last-2); re-declare against the current state instead")
      }
    val freshDv = SnapshotManifest.partsOf(spark, root, to)
      .filterNot(before).filter(_.startsWith("dv_"))
    require(freshDv.isEmpty,
      s"window $from -> $to at $root carries deletion vectors; the " +
        "plain-read identity this registry audits does not apply " +
        "them — compact and re-declare instead")
    graft.catalog.Layout.changes(spark, root, from, to)
  }

  /** Shared scaffold for the incremental re-verifiers: decompose the
    * stamp, probe the current state, and return `(newFp, moved)`
    * where `moved` maps each CHANGED root to its append-only change
    * window. `None` when nothing moved (fast no-op path). Refuses —
    * with the caller's noun in the message — stamps that are unusable
    * or roots that moved without snapshot identity at both ends. */
  private[plans] def movedWindows(spark: SparkSession, stamp: String,
                                  roots: Set[String], what: String)
      : Option[(String, Map[String, org.apache.spark.sql.DataFrame])] = {
    val rs = roots.toSeq.sorted
    val seg = segments(stamp, roots).getOrElse(
      throw new IllegalStateException(
        s"$what carries no usable fingerprint stamp; re-declare"))
    val curSeg = rs.map(r => r -> one(spark, r)).toMap
    val newFp = rs.map(curSeg).mkString(";")
    if (newFp == stamp) return None
    val moved = rs.filter(r => curSeg(r) != seg(r)).map { r =>
      require(seg(r).startsWith("snap:") && curSeg(r).startsWith("snap:"),
        s"$what: table at $r moved but is not snapshot-logged at both " +
          "ends; re-declare instead")
      r -> appendOnlyWindow(spark, r,
        seg(r).stripPrefix("snap:"), curSeg(r).stripPrefix("snap:"))
    }.toMap
    Some((newFp, moved))
  }

  /** Guard for the declaration-time audits: the caller's DataFrame
    * pinned its FILE LISTING when `spark.read.parquet` ran — possibly
    * before the declaration's fingerprint probe. A writer appending in
    * that gap would be COVERED by the stamp yet UNSEEN by the audit
    * (the audit scans the pinned listing), silently defeating the
    * staleness guard. Refuse when the frame's pinned input files
    * differ from the roots' current data files; the caller re-reads
    * and re-declares — one metadata listing, no data read. */
  private[plans] def requireFresh(spark: SparkSession,
                                  df: org.apache.spark.sql.DataFrame,
                                  roots: Set[String], what: String): Unit = {
    def norm(s: String): String = new Path(s).toUri.getPath
    // collect from the ANALYZED plan's pinned file index, not
    // Dataset.inputFiles — the latter propagates empty relations
    // (e.g. a limit(0) frame reports NO files though its scan pinned
    // a full listing) and would fail every such declaration
    val pinned = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten.map(norm).toSet
    val live = roots.flatMap { r =>
      val p = new Path(r)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq.empty[String]
      else {
        val qroot = fs.makeQualified(p).toString
        val out = Seq.newBuilder[String]
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          val rel = f.getPath.toString.stripPrefix(qroot).stripPrefix("/")
          val hidden = rel.split('/')
            .exists(c => c.startsWith("_") || c.startsWith("."))
          if (!hidden) out += norm(f.getPath.toString)
        }
        out.result()
      }
    }
    require(pinned == live,
      s"$what: the audited frame's file listing no longer matches the " +
        "table on disk (a write landed between the read and the " +
        "declaration, or the frame scans a subset); re-read the table " +
        s"and re-declare [frame-only: ${(pinned -- live).take(3)}; " +
        s"disk-only: ${(live -- pinned).take(3)}]")
  }

  /** The current table restricted to the batch's key tuples — the
    * slice a PK re-audit must cover (uniqueness can only break AT the
    * touched keys). NULL-SAFE equality: a plain equi-semi-join never
    * matches NULL keys, so a NULL-keyed duplicate would silently
    * escape the restricted audit that SQL grouping (and
    * `Validate.primaryKey`'s groupBy) treats as equal. Batch-sized
    * join state; one scan of the table. */
  private[plans] def restrictToKeys(table: org.apache.spark.sql.DataFrame,
                                    keyRows: org.apache.spark.sql.DataFrame,
                                    keys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val probe = keyRows
      .select(keys.map(k => col(k).as(s"__k_$k")): _*).distinct()
    table.join(probe,
      keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _), "left_semi")
  }

  private[plans] def one(spark: SparkSession, root: String): String = {
    probes.incrementAndGet()
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val st = fs.getFileStatus(p)
    if (st.isFile) return s"f:${st.getLen}:${st.getModificationTime}"
    SnapshotManifest.currentSnap(spark, root) match {
      case Some(snap) => s"snap:$snap"
      case None =>
        val qroot = fs.makeQualified(p).toString
        var n = 0L; var bytes = 0L; var mt = 0L
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          val rel = f.getPath.toString.stripPrefix(qroot).stripPrefix("/")
          val hidden = rel.split('/')
            .exists(c => c.startsWith("_") || c.startsWith("."))
          if (!hidden) {
            n += 1; bytes += f.getLen
            if (f.getModificationTime > mt) mt = f.getModificationTime
          }
        }
        s"ls:$n:$bytes:$mt"
    }
  }
}

/** ONE-PLANNING-PASS fingerprint memo. Each rewrite rule constructs a
  * fresh instance per `apply` invocation, so within a single pass a
  * root path is fingerprinted AT MOST ONCE no matter how many
  * candidate plan nodes match a registered table — a query with K
  * rewrite candidates over a plain-parquet directory of F files costs
  * one O(F) listing, not K of them, and snapshot-logged tables cost
  * one `_latest` read. Deliberately NOT a TTL cache: the memo dies
  * with the pass, so a same-JVM append between two queries is always
  * seen by the next plan — no staleness window to reason about. */
final class FpCache(spark: SparkSession) {
  private val memo = scala.collection.mutable.HashMap.empty[String, String]

  def matches(stamped: String, roots: Set[String]): Boolean =
    stamped.isEmpty || stamped == roots.toSeq.sorted
      .map(r => memo.getOrElseUpdate(r, TableState.one(spark, r)))
      .mkString(";")
}
