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
  * readers — same concurrency contract as IndexIo/StatsCache.
  */
object SnapshotManifest {
  val ManifestsDir = "_manifests"
  val SnapsDir = "_snaps"
  val LatestFile = "_latest"

  def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Unique, wall-clock-ordered token: nanoTime alone is NOT ordered
    * across JVM restarts (its origin is arbitrary per process), and
    * keep-last-2 GC needs snapshots written by successive writer
    * processes to sort correctly. */
  private def token(): String =
    f"${System.currentTimeMillis()}%013d_${System.nanoTime()}%019d"

  /** `prefix` distinguishes part KINDS within one snapshot: `m` =
    * data-file zone manifest, `dv` = deletion vector ([[Layout]]
    * filters by prefix when resolving each). */
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
    * flip `_latest`. Returns the snap name. */
  def commit(spark: SparkSession, root: String, parts: Seq[String]): String = {
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
