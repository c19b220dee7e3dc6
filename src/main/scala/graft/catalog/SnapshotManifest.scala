package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import java.nio.charset.StandardCharsets

/** Snapshot log for manifest-backed tables — the
  * [[graft.pipeline.IndexIo]] / [[graft.streaming.Streams.scd2Sink]]
  * `_latest`-flip pattern generalized from a single directory pointer
  * to a LIST of immutable manifest parts (the simplified
  * Delta/Iceberg transaction-log shape):
  *
  * {{{
  * <root>/_manifests/m_<ms>_<nano>/   parquet manifest parts
  *                                    (immutable once committed)
  * <root>/_snaps/snap_<ms>_<nano>     text: one part name per line
  * <root>/_latest                     text: current snap name
  * }}}
  *
  * Crash contract: every mutation writes ONLY NEW files/dirs and
  * flips `_latest` LAST via write-temp + rename(OVERWRITE) — atomic
  * on HDFS and POSIX. A crash at any earlier point leaves the
  * previous snapshot fully intact and the partial artifacts
  * unreferenced: invisible to readers, reclaimed later by the
  * owner's vacuum (e.g. [[Layout.vacuum]]). SINGLE WRITER, many
  * readers — same concurrency contract as IndexIo/StatsCache —
  * with an OPTIMISTIC-CONCURRENCY safety net: a [[commit]] carrying
  * `expectedSnap` verifies, under the commit lock, that the table is
  * still on the snapshot the writer based its work on, and throws
  * [[ConcurrentCommitException]] otherwise. Two maintainers racing
  * (compact + delete) can no longer silently drop each other's
  * parts: the loser fails loudly and retries against the winner's
  * snapshot.
  */
object SnapshotManifest {
  val ManifestsDir = "_manifests"
  val SnapsDir = "_snaps"
  val LatestFile = "_latest"
  val LockFile = "_commit_lock"

  /** A conditional [[commit]] found the table moved past the
    * snapshot the writer read — the optimistic-concurrency loser.
    * Nothing was committed; recompute against the current snapshot
    * and retry. */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Unique, wall-clock-ordered token: nanoTime alone is NOT ordered
    * across JVM restarts (its origin is arbitrary per process), and
    * keep-last-2 GC needs snapshots written by successive writer
    * processes to sort correctly. The nano component is masked
    * non-negative — its origin is arbitrary, so it CAN be negative,
    * and a '-' sorts before every digit, breaking lexicographic
    * ordering within one millisecond. Shared (private[graft]) so
    * other versioned-file artifacts (RegistryStore) inherit the
    * ordering contract instead of re-deriving it. */
  private[graft] def token(): String =
    f"${System.currentTimeMillis()}%013d_${System.nanoTime() & Long.MaxValue}%019d"

  /** `prefix` distinguishes part KINDS within one snapshot: `m` =
    * data-file zone manifest, `dv` = deletion vector, `bf` = per-file
    * bloom index ([[Layout]] filters by prefix when resolving each). */
  def newPartName(prefix: String = "m"): String = s"${prefix}_${token()}"

  def partPath(root: String, part: String): String =
    s"$root/$ManifestsDir/$part"

  /** Current snap name from the `_latest` pointer, if present. */
  def currentSnap(spark: SparkSession, root: String): Option[String] = {
    val fs = fsOf(spark, root)
    val pointer = new Path(root, LatestFile)
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Manifest part names of a given snap (one per line). */
  def partsOf(spark: SparkSession, root: String, snap: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val in = fs.open(new Path(new Path(root, SnapsDir), snap))
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
    text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Manifest part names of the CURRENT snapshot, or None when the
    * table has no snapshot log (legacy layout). */
  def currentParts(spark: SparkSession, root: String): Option[Seq[String]] =
    currentSnap(spark, root).map(partsOf(spark, root, _))

  /** Commit a new snapshot referencing `parts`: write the snap file
    * (temp + rename — never observable half-written), then atomically
    * flip `_latest`. Returns the snap name.
    *
    * `expectedSnap` = compare-and-swap: `Some(prev)` verifies — under
    * the table's commit lock — that `_latest` still names `prev`
    * (`Some(None)` = "no snapshot yet", the create case) and throws
    * [[ConcurrentCommitException]] without committing when the table
    * moved. `None` commits unconditionally (the create/repair paths,
    * which own the table by contract). */
  def commit(spark: SparkSession, root: String, parts: Seq[String],
             expectedSnap: Option[Option[String]] = None): String =
    expectedSnap match {
      case None => doCommit(spark, root, parts)
      case Some(exp) => withLock(spark, root) {
        val cur = currentSnap(spark, root)
        if (cur != exp)
          throw new ConcurrentCommitException(
            s"commit at $root expected snapshot ${exp.getOrElse("<none>")} " +
              s"but found ${cur.getOrElse("<none>")}: a concurrent writer " +
              "committed first — recompute against the current snapshot " +
              "and retry")
        doCommit(spark, root, parts)
      }
    }

  private def doCommit(spark: SparkSession, root: String,
                       parts: Seq[String]): String = {
    val fs = fsOf(spark, root)
    val snapsDir = new Path(root, SnapsDir)
    fs.mkdirs(snapsDir)
    val snap = s"snap_${token()}"
    val tmp = new Path(snapsDir, s".tmp_$snap")
    val out = fs.create(tmp, true)
    try out.write(parts.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(snapsDir, snap)))
      throw new java.io.IOException(s"snapshot commit: rename failed for $snap")
    flip(spark, root, snap)
    snap
  }

  /** Table-level commit mutex via atomic create-if-absent of
    * `_commit_lock` (atomic on HDFS and POSIX). Bounded wait, then a
    * loud failure naming the lock — a crashed holder's stale lock is
    * broken by deleting the file (the error says so). The lock only
    * serializes the verify+flip window of CONDITIONAL commits; reads
    * never touch it. */
  private def withLock[T](spark: SparkSession, root: String)(body: => T): T = {
    val fs = fsOf(spark, root)
    val lock = new Path(root, LockFile)
    val deadline = System.currentTimeMillis() + 10000
    var acquired = false
    while (!acquired) {
      try { fs.create(lock, false).close(); acquired = true }
      catch { case _: java.io.IOException =>
        if (System.currentTimeMillis() > deadline)
          throw new java.io.IOException(
            s"timed out acquiring $lock; if its writer crashed, " +
              "delete the file to break the stale lock")
        Thread.sleep(20)
      }
    }
    try body finally fs.delete(lock, false)
  }

  /** Compare-and-swap flip for ARTIFACTS that manage their own version
    * files (the registry store): under the directory's commit lock,
    * point `_latest` at `next` iff it still names `expected`
    * (`None` = "no pointer yet"). Returns false — flipping nothing —
    * when a concurrent writer moved the pointer first; the caller
    * re-reads, re-merges, and retries with a fresh version file. */
  def casFlip(spark: SparkSession, root: String, next: String,
              expected: Option[String]): Boolean =
    withLock(spark, root) {
      val cur = currentSnap(spark, root)
      if (cur == expected) { flip(spark, root, next); true } else false
    }

  /** Atomically point `_latest` at `snap` (the IndexIo flip verbatim:
    * FileContext rename with OVERWRITE — a torn or missing pointer is
    * never observable). */
  def flip(spark: SparkSession, root: String, snap: String): Unit = {
    val fs = fsOf(spark, root)
    val tmp = new Path(root, s".${LatestFile}.tmp_${token()}")
    val out = fs.create(tmp, true)
    try out.write(snap.getBytes(StandardCharsets.UTF_8)) finally out.close()
    FileContext.getFileContext(new Path(root).toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(root, LatestFile), Options.Rename.OVERWRITE)
  }

  /** All snap names on disk, ascending by commit order. */
  def snaps(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, SnapsDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("snap_")).sorted.toSeq
  }

  /** The snapshots a keep-last-2 GC must retain: the current one plus
    * the most recent other — in-flight readers of the previous
    * snapshot stay valid through one maintenance cycle (the scd2Sink
    * GC discipline). */
  def keepLast2(spark: SparkSession, root: String): Seq[String] =
    currentSnap(spark, root).toSeq.flatMap { cur =>
      (snaps(spark, root).filter(_ != cur).lastOption.toSeq :+ cur)
    }
}
