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
    * just writes one file into each). */
  def writeClusteredZoned(df: DataFrame, path: String, symbol: String,
                          time: String, numBuckets: Int = 16,
                          filesPerBucket: Int = 4): Unit =
    df.withColumn("sym_bucket", bucketOf(col(symbol), numBuckets))
      .repartitionByRange(numBuckets * filesPerBucket,
        col("sym_bucket"), col(time))
      .sortWithinPartitions(col(symbol), col(time))
      .write.mode("overwrite")
      .partitionBy("sym_bucket")
      .parquet(path)

  /** ONE catalog read composing BOTH prunings — what a real table
    * wants behind a single entry point: the bucket partition filter
    * (key equality → 1/numBuckets of directories, pruned by Catalyst
    * partition pruning before any footer is opened) and the zone-map
    * file skip (range predicate → only overlapping files of the
    * surviving bucket make the task list). The zone manifest is built
    * over the ALREADY bucket-pruned frame, so its footer scan is also
    * 1/numBuckets. Exact predicates are re-applied on the pruned scan;
    * the result is always ≡ the plain filter (the s11 oracle), the
    * file-set shrinkage is pinned by ZoneMapSpec via `inputFiles`. */
  def read(spark: SparkSession, path: String, symbol: String, time: String,
           numBuckets: Int = 16, symbolEq: Option[String] = None,
           timeRange: Option[(Column, Column)] = None): DataFrame = {
    def bucketPruned(df: DataFrame): DataFrame = symbolEq.fold(df) { v =>
      df.filter(col("sym_bucket") === bucketOf(lit(v), numBuckets))
    }
    val base = bucketPruned(spark.read.option("basePath", path).parquet(path))
    val zoned = timeRange match {
      case None => base
      case Some((lo, hi)) =>
        // bounded by FILE count (of one bucket), not row count
        val files = ZoneMap.manifestOf(base, time)
          .filter(col("zmax") >= lo && col("zmin") <= hi)
          .select(col("file")).collect().map(_.getString(0))
        if (files.isEmpty) base.limit(0)
        else bucketPruned(
          spark.read.option("basePath", path).parquet(files.toSeq: _*))
    }
    val keyed = symbolEq.fold(zoned)(v => zoned.filter(col(symbol) === v))
    timeRange.fold(keyed) { case (lo, hi) =>
      keyed.filter(col(time) >= lo && col(time) <= hi)
    }
  }
}
