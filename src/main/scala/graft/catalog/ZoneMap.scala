package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — the Delta/Iceberg-style data-skipping index:
  * one (file → min, max) manifest row per data file for a chosen
  * column, consulted BEFORE the scan so a selective range predicate
  * reads only the files whose zone overlaps. Complements [[Layout]]'s
  * bucket pruning (key equality) with RANGE skipping, and works above
  * parquet's row-group stats: row groups prune IO inside a file the
  * engine already opened; zone maps keep non-overlapping files off the
  * task list entirely — at 100 TB that is the difference between
  * launching 100k tasks and launching 40.
  *
  * The manifest is tiny (one row per file) and would be persisted next
  * to the data in a real deployment; [[manifest]] builds it with one
  * aggregate over `input_file_name()`. Skipping is only effective when
  * writes cluster the column ([[writeRangeClustered]] range-partitions
  * so each file covers a tight, near-disjoint value range).
  */
object ZoneMap {

  /** Range-clustered write: `repartitionByRange` on the zone column
    * (+ tie-break id) so each of the `numFiles` output files covers a
    * tight value range — the layout that makes zone skipping bite. */
  def writeRangeClustered(df: DataFrame, path: String, zoneCol: String,
                          numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(zoneCol))
      .sortWithinPartitions(col(zoneCol))
      .write.mode("overwrite").parquet(path)

  /** Build the per-file (min, max) manifest for `zoneCol`: one
    * hash-agg over the file-name pseudo-column. Persist the result in
    * a real deployment; rebuilt here per call for self-containment. */
  def manifest(spark: SparkSession, path: String, zoneCol: String): DataFrame =
    manifestOf(spark.read.parquet(path), zoneCol)

  /** Manifest over an already-pruned frame — the composition entry
    * point ([[Layout.read]]): partition/bucket pruning restricts the
    * frame first, so the manifest aggregate scans only surviving
    * files' footers, not the whole table. */
  def manifestOf(df: DataFrame, zoneCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(zoneCol)).as("zmin"), max(col(zoneCol)).as("zmax"))

  /** Read only the files whose zone overlaps `[lo, hi]`, then apply
    * the exact predicate. The manifest filter + collect is bounded by
    * the FILE count (not row count); the returned frame's scan list is
    * the pruned file set — assert with `df.inputFiles` in tests. */
  def readRange(spark: SparkSession, path: String, zoneCol: String,
                lo: Column, hi: Column): DataFrame = {
    val files = manifest(spark, path, zoneCol)
      .filter(col("zmax") >= lo && col("zmin") <= hi)
      .select(col("file"))
      .collect().map(_.getString(0))
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0) // degenerate: nothing overlaps
      else spark.read.parquet(files: _*)
    base.filter(col(zoneCol) >= lo && col(zoneCol) <= hi)
  }
}
