package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
