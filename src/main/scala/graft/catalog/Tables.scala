package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Table registry over the driver's parquet layout (`TESTDATA.md`):
  * one parquet file per table under a scale-factor directory.
  *
  * At 100 TB each of these would be a partitioned/bucketed parquet (or
  * Iceberg/Delta) table; the loader API is the single seam where that
  * swap happens — query code only ever sees DataFrames by table name.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcastable in joins. */
  val dims: Set[String] = Set("region", "nation", "supplier", "part", "customer")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects
      // outright; read it as a long and truncate to microseconds (what
      // DuckDB/pyarrow do implicitly when downcasting ns → µs).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integer DIV, not `/`: epoch-nanos exceed 2^53, so double
      // division (what `/` means on Columns) is off by ±1µs
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
