package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory with the engine's scale-oriented defaults.
  *
  * These settings are chosen for the 100 TB posture, scaled down to the
  * local[32] test harness:
  *   - AQE on (runtime shuffle-partition coalescing + skew-join splitting),
  *   - shuffle partitions sized to cores (not the 200 default),
  *   - broadcast threshold left at default 10 MB — all dimension tables in
  *     the reference's model (users, Portfolio, Holdings, StockSymbols) are
  *     tiny; fact tables (Stocks / lineitem) never broadcast.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // JVM-wide codegen class cache (static conf): the default 100
      // entries thrash under this engine's plan diversity — see the
      // measured A/B in Bench.scala
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
