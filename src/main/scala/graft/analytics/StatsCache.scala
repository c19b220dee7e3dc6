package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Materialized statistics memoization — the reference's
  * `statistics_cache` table (`sql/schema.sql:101-110`): probe before
  * compute (`portfolio.js:329-345`), upsert write-back
  * (`portfolio.js:427-445`), `updated_at` staleness column.
  *
  * Storage is snapshot-versioned (each write-back lands in a fresh
  * `snap_*` directory and flips a `_latest` pointer) so in-flight
  * readers of the previous snapshot never see files vanish — the
  * minimal copy-on-write table-format pattern; swap for Delta/Iceberg
  * MERGE at production scale. Workflow-level caching (SURVEY §4): no
  * custom Catalyst rule needed. The cache table is tiny relative to
  * the fact table — probes are broadcast semi-joins and a miss costs
  * exactly one statistics job for all missing keys together (the
  * reference pays a per-symbol loop).
  *
  * Concurrency contract: SINGLE WRITER, many readers. The pointer
  * flip is write-temp-then-rename-with-OVERWRITE (atomic on HDFS and
  * POSIX), so a concurrent reader always sees a complete pointer
  * (never torn, never missing); but two
  * concurrent writeBacks would base-read the same snapshot and the
  * last rename would silently drop the other's upserts — serialize
  * write-backs externally (a real deployment gets this from the
  * table format's optimistic commit). Run [[vacuum]] only from the
  * writer, after a grace period covering the longest in-flight read
  * of the previous snapshot.
  */
class StatsCache(spark: SparkSession, root: String, keyCols: Seq[String]) {
  import graft.ops.Kernels

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)
  private def pointer = new Path(root, "_latest")

  private def currentSnap(): Option[String] =
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim)
      finally in.close()
    }

  private def read(): Option[DataFrame] =
    currentSnap().map(s => spark.read.parquet(new Path(root, s).toString))

  /** Cached rows for the requested keys (semi-join probe). */
  def probe(keys: DataFrame): DataFrame = {
    val keyset = keys.select(keyCols.map(col): _*).distinct()
    read() match {
      case Some(df) => df.join(broadcast(keyset), keyCols, "left_semi")
      case None     => keys.sparkSession.emptyDataFrame
    }
  }

  /** Upsert freshly computed stats (stamped with updated_at). */
  def writeBack(fresh: DataFrame): Unit = {
    val stamped = fresh.withColumn("updated_at", current_timestamp())
    val merged = read() match {
      case Some(existing) =>
        Kernels.upsert(existing, stamped.select(existing.columns.map(col): _*), keyCols)
      case None => stamped
    }
    val snap = s"snap_${System.nanoTime()}"
    merged.write.mode("overwrite").parquet(new Path(root, snap).toString)
    // write the pointer to a temp file and rename OVER the old one
    // (Options.Rename.OVERWRITE — atomic on HDFS and POSIX): a
    // create+write in place would expose a torn/empty pointer, and a
    // delete-then-rename would expose a missing one
    val tmp = new Path(root, s"_latest.tmp_${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(snap.getBytes(StandardCharsets.UTF_8)) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(spark.sparkContext.hadoopConfiguration)
      .rename(tmp, pointer, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Drop all snapshots except the current one. */
  def vacuum(): Unit = currentSnap().foreach { keep =>
    fs.listStatus(new Path(root)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("snap_") && n != keep) fs.delete(st.getPath, true)
    }
  }

  /** Compute-through: cached rows for hit keys; `compute` runs ONCE
    * for all missing keys (vs the reference's per-key query loop,
    * portfolio.js:359-424); results are written back. */
  def getOrCompute(keys: DataFrame, compute: DataFrame => DataFrame): DataFrame = {
    val hits = probe(keys)
    val allKeys = keys.select(keyCols.map(col): _*).distinct()
    val missKeys =
      if (hits.columns.isEmpty) allKeys // cold cache: everything misses
      else allKeys.join(hits.select(keyCols.map(col): _*), keyCols, "left_anti")
    if (!missKeys.isEmpty) {
      val fresh = compute(missKeys)
      writeBack(fresh)
    }
    // re-probe against the (possibly new) snapshot so the returned
    // frame reads one consistent version
    probe(keys)
  }
}
