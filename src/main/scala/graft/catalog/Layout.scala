package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the fact table — the Spark analog of the
  * reference's clustered composite PK `Stocks(symbol, timestamp)`
  * (`sql/schema.sql:9`, SURVEY §4): partition by a bounded symbol
  * bucket, sort within partitions by (symbol, timestamp).
  *
  * Effects at scale:
  *   - per-symbol scans prune to one bucket directory
  *     (`PartitionFilters` in the plan — only 1/numBuckets of files
  *     touched);
  *   - within files, rows are (symbol, ts)-clustered so parquet
  *     min/max row-group stats prune time ranges;
  *   - windows/latest-per-key over (symbol, ts) read presorted data.
  *
  * Directory partitioning by raw symbol would create one directory
  * per symbol (fine for 500 S&P symbols, catastrophic for unbounded
  * keys) — the hash bucket bounds directory count at any cardinality.
  */
object Layout {

  def bucketOf(symbol: org.apache.spark.sql.Column, numBuckets: Int) =
    pmod(xxhash64(symbol), lit(numBuckets))

  /** Write a time-series frame in the clustered layout. */
  def writeClustered(df: DataFrame, path: String, symbol: String,
                     time: String, numBuckets: Int = 16): Unit =
    df.withColumn("sym_bucket", bucketOf(col(symbol), numBuckets))
      .repartition(col("sym_bucket"))
      .sortWithinPartitions(col(symbol), col(time))
      .write.mode("overwrite")
      .partitionBy("sym_bucket")
      .parquet(path)

  /** Read back with a symbol predicate that prunes partitions: the
    * bucket filter is derivable from the symbol filter, so only one
    * directory is listed/scanned. */
  def readSymbol(spark: SparkSession, path: String, symbolValue: String,
                 symbol: String = "symbol", numBuckets: Int = 16): DataFrame =
    spark.read.parquet(path)
      .filter(col("sym_bucket") === bucketOf(lit(symbolValue), numBuckets) &&
        col(symbol) === symbolValue)

  /** Clustered AND zoned write — the full table layout: bucket
    * directories bound key-equality scans ([[readSymbol]]'s pruning),
    * and WITHIN each bucket the rows are range-sliced on `time` into
    * `filesPerBucket` files so each file covers a tight time zone
    * ([[ZoneMap]] skipping). `repartitionByRange(bucket, time)` yields
    * contiguous (bucket, time) slices; `partitionBy` then lands each
    * slice in its bucket directory (a slice straddling two buckets
    * just writes one file into each).
    *
    * The zone manifest is persisted AT WRITE TIME to `_zonemap/` (one
    * row per data file: relative path, bucket, zmin, zmax — the
    * Delta/Iceberg stats-manifest shape): [[read]] consults it instead
    * of re-deriving zones from data files per query, which at 100×
    * files is a metadata job per read. The leading underscore keeps it
    * out of data discovery. SINGLE WRITER: mode=overwrite replaces
    * data then manifest in place — concurrent readers of an
    * in-progress overwrite may see FileNotFound (a snapshotting table
    * format is the production answer; [[graft.pipeline.IndexIo]] shows
    * the pattern). */
  def writeClusteredZoned(df: DataFrame, path: String, symbol: String,
                          time: String, numBuckets: Int = 16,
                          filesPerBucket: Int = 4): Unit = {
    df.withColumn("sym_bucket", bucketOf(col(symbol), numBuckets))
      .repartitionByRange(numBuckets * filesPerBucket,
        col("sym_bucket"), col(time))
      .sortWithinPartitions(col(symbol), col(time))
      .write.mode("overwrite")
      .partitionBy("sym_bucket")
      .parquet(path)
    writeZoneManifest(df.sparkSession, path, time)
  }

  /** (Re)build the `_zonemap/` manifest from the table's CURRENT data
    * files: one pass over the table (column-pruned to `time`),
    * collected driver-side — bounded by FILE count, not rows. Paths
    * are stored RELATIVE to the table root (the manifest survives a
    * table move) and URI-DECODED (input_file_name returns escaped
    * URIs; see [[literalPath]]). */
  def writeZoneManifest(spark: SparkSession, path: String, time: String): Unit = {
    val written = spark.read.option("basePath", path).parquet(path)
    val agg = written
      .groupBy(input_file_name().as("file"), col("sym_bucket"))
      .agg(min(col(time)).as("zmin"), max(col(time)).as("zmax"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(path)).toString
    val rows = agg.collect().map { r =>
      val p = fs.makeQualified(
        new org.apache.hadoop.fs.Path(new java.net.URI(r.getString(0)))).toString
      org.apache.spark.sql.Row(
        p.stripPrefix(root).stripPrefix("/"), r.get(1), r.get(2), r.get(3))
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_zonemap")
  }

  /** Append a new slice to an existing clustered+zoned table WITHOUT
    * rewriting it — the ingest path for a growing fact table (daily
    * bars, event batches): a full [[writeClusteredZoned]] rewrite per
    * batch is O(table) at 100 TB; this is O(batch).
    *
    * The appended slice gets the same layout discipline (bucket
    * directories, time-range slicing, (symbol, time) sort within
    * files), and the `_zonemap/` manifest is updated INCREMENTALLY:
    * zones are aggregated over just the fresh files (diff of the
    * bucket listings around the write — bounded by file count) and
    * unioned with the existing manifest rows. Appending many small
    * batches fragments buckets — run [[compact]] periodically (the
    * manifest survives both). Same single-writer contract as every
    * Layout write. */
  def appendClusteredZoned(df: DataFrame, path: String, symbol: String,
                           time: String, numBuckets: Int = 16,
                           filesPerBucket: Int = 4): Unit = {
    val spark = df.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(path)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles: Set[String] =
      if (!fs.exists(rootP)) Set.empty
      else fs.listStatus(rootP).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("sym_bucket=")).flatMap(b =>
        fs.listStatus(b.getPath).filter(f => f.isFile &&
          !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
          .map(f => b.getPath.getName + "/" + f.getPath.getName)).toSet
    val before = dataFiles
    df.withColumn("sym_bucket", bucketOf(col(symbol), numBuckets))
      .repartitionByRange(numBuckets * filesPerBucket,
        col("sym_bucket"), col(time))
      .sortWithinPartitions(col(symbol), col(time))
      .write.mode("append")
      .partitionBy("sym_bucket")
      .parquet(path)
    val fresh = (dataFiles -- before).toSeq.sorted
    if (fresh.nonEmpty) {
      val root = fs.makeQualified(rootP).toString
      val freshPaths = fresh.map(f => globEscape(
        new org.apache.hadoop.fs.Path(path, f).toString))
      val agg = spark.read.option("basePath", path).parquet(freshPaths: _*)
        .groupBy(input_file_name().as("file"), col("sym_bucket"))
        .agg(min(col(time)).as("zmin"), max(col(time)).as("zmax"))
      val freshRows = agg.collect().map { r =>
        val p = fs.makeQualified(
          new org.apache.hadoop.fs.Path(new java.net.URI(r.getString(0)))).toString
        org.apache.spark.sql.Row(
          p.stripPrefix(root).stripPrefix("/"), r.get(1), r.get(2), r.get(3))
      }
      val freshDf = spark.createDataFrame(
        java.util.Arrays.asList(freshRows: _*), agg.schema)
      val mPath = new org.apache.hadoop.fs.Path(path, "_zonemap")
      val merged =
        if (fs.exists(mPath))
          spark.read.parquet(mPath.toString).unionByName(freshDf)
        else freshDf
      // overwrite reads-then-writes the same path: materialize first
      val rows = merged.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
        .coalesce(1).write.mode("overwrite").parquet(mPath.toString)
    }
  }

  /** Small-file compaction — the maintenance pass every streaming /
    * CoW writer eventually needs (each micro-batch or merge epoch
    * lands more files; at 100 TB an uncompacted table turns every scan
    * into a metadata+open storm). Bin-packs each over-fragmented
    * bucket back to ≤ `filesPerBucket` time-zoned files:
    *
    *   - O(affected buckets), the [[graft.streaming.Streams.scd2Sink]]
    *     discipline: buckets already at or under the target are not
    *     read, not rewritten;
    *   - a rewritten bucket keeps the layout contract — range-sliced
    *     on `time` (tight zones for [[ZoneMap]] skipping), rows sorted
    *     by (symbol, time);
    *   - each bucket directory is swapped by rename, then `_zonemap/`
    *     is rebuilt ONCE at the end. Same single-writer contract as
    *     [[writeClusteredZoned]]; readers racing the swap may see
    *     FileNotFound.
    *
    * Returns the number of buckets rewritten. */
  def compact(spark: SparkSession, path: String, symbol: String, time: String,
              filesPerBucket: Int = 4): Int = {
    val rootP = new org.apache.hadoop.fs.Path(path)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(rootP).filter(st => st.isDirectory &&
      st.getPath.getName.startsWith("sym_bucket="))
    var rewritten = 0
    buckets.foreach { b =>
      val dataFiles = fs.listStatus(b.getPath).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
      if (dataFiles.length > filesPerBucket) {
        val df = spark.read.parquet(globEscape(b.getPath.toString))
        val tmp = new org.apache.hadoop.fs.Path(rootP,
          "." + b.getPath.getName + "_compact_" + spark.sparkContext.applicationId)
        df.repartitionByRange(filesPerBucket, col(time))
          .sortWithinPartitions(col(symbol), col(time))
          .write.mode("overwrite").parquet(tmp.toString)
        // no _SUCCESS marker inside a partition directory
        fs.delete(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), false)
        fs.delete(b.getPath, true)
        if (!fs.rename(tmp, b.getPath))
          throw new java.io.IOException(s"compact: rename failed for ${b.getPath}")
        rewritten += 1
      }
    }
    if (rewritten > 0) writeZoneManifest(spark, path, time)
    rewritten
  }

  /** `input_file_name()` / manifest entries → literal reader paths:
    * URI-unescape (a `%20` or `%25` in the stored string is a space or
    * percent on disk), then backslash-escape glob metacharacters so
    * the second `spark.read.parquet` resolves the SAME file even when
    * the path contains `%`, spaces, or `{}[]*?`. */
  private def literalPath(uriString: String): String =
    globEscape(new org.apache.hadoop.fs.Path(new java.net.URI(uriString)).toString)

  private def globEscape(p: String): String =
    p.replaceAll("([{}\\[\\]*?\\\\])", "\\\\$1")

  /** ONE catalog read composing BOTH prunings — what a real table
    * wants behind a single entry point: the bucket partition filter
    * (key equality → 1/numBuckets of directories, pruned by Catalyst
    * partition pruning before any footer is opened) and the zone-map
    * file skip (range predicate → only overlapping files of the
    * surviving bucket make the task list). Zones come from the
    * write-time `_zonemap/` manifest when present — a range read then
    * opens NO non-matching data file at all, not even its footer
    * (pinned by ZoneMapSpec against corrupted cold files); tables
    * written without a manifest fall back to deriving zones from the
    * bucket-pruned data files. Exact predicates are re-applied on the
    * pruned scan; the result is always ≡ the plain filter (the s11
    * oracle). Assumes the [[writeClusteredZoned]] single-writer
    * contract — a read racing an overwrite may see FileNotFound. */
  def read(spark: SparkSession, path: String, symbol: String, time: String,
           numBuckets: Int = 16, symbolEq: Option[String] = None,
           timeRange: Option[(Column, Column)] = None): DataFrame = {
    def bucketPruned(df: DataFrame): DataFrame = symbolEq.fold(df) { v =>
      df.filter(col("sym_bucket") === bucketOf(lit(v), numBuckets))
    }
    def fullScan = bucketPruned(
      spark.read.option("basePath", path).parquet(path))
    val zoned = timeRange match {
      case None => fullScan
      case Some((lo, hi)) =>
        val mPath = new org.apache.hadoop.fs.Path(path, "_zonemap")
        val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // both branches are bounded by FILE count (of one bucket)
        val files: Array[String] =
          if (fs.exists(mPath)) {
            val m = spark.read.parquet(mPath.toString)
            bucketPruned(m).filter(col("zmax") >= lo && col("zmin") <= hi)
              .select(col("file")).collect().map(r => globEscape(
                new org.apache.hadoop.fs.Path(path, r.getString(0)).toString))
          } else ZoneMap.manifestOf(fullScan, time)
            .filter(col("zmax") >= lo && col("zmin") <= hi)
            .select(col("file")).collect()
            .map(r => literalPath(r.getString(0)))
        if (files.isEmpty) fullScan.limit(0)
        else bucketPruned(
          spark.read.option("basePath", path).parquet(files.toSeq: _*))
    }
    val keyed = symbolEq.fold(zoned)(v => zoned.filter(col(symbol) === v))
    timeRange.fold(keyed) { case (lo, hi) =>
      keyed.filter(col(time) >= lo && col(time) <= hi)
    }
  }
}
