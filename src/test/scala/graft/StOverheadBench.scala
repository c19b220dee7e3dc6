package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Test-scope measurement main (NOT part of the library surface):
  * quantifies the FIXED streaming-query lifecycle overhead that every
  * real-streaming gate (st4-st10, st12, st13, st15) pays regardless
  * of data volume — query start (micro-batch planner + state-store
  * init + temp checkpoint), N× processAllAvailable round-trips
  * (offset/commit log writes + the no-data watermark batch), stop.
  *
  * Motivation (VERDICT r18 task 6): under host contention these gates
  * inflate 20-30× from ~0.2 s bases because the overhead is dozens of
  * tiny scheduler events, not CPU work. The batch-collapse fix is
  * unavailable — batch BOUNDARIES are load-bearing (st5's
  * first-arrival-wins spans them; st13's append-mode windows emit on
  * watermark advance in the no-data batch), and disabling
  * noDataMicroBatches would hold back append-mode window emission
  * (st10/st13 outputs change). So the artifact-side fix is a measured
  * per-gate overhead table in BENCH_NOTES that lets a reader discount
  * the fixed share. Run:
  *   sbt "Test/runMain graft.StOverheadBench"   (SPARK_GRAFT_SF_DIR)
  *
  * Emits one JSON line: floors (stateless / stateful@8 / stateful
  * with noDataMicroBatches off — measured for the record only) and
  * each real-streaming gate's isolated 2-pass-min wall time.
  */
object StOverheadBench {
  private val stGates = Seq(
    "st4_scd2_stream", "st5_stream_dedup", "st6_stream_holdings",
    "st7_stream_enrich", "st8_stream_ingest", "st9_stream_view",
    "st10_stream_mv", "st12_stream_corpus_dedup",
    "st13_stream_star_mv", "st15_stream_media_dedup")

  /** Minimal 3-micro-batch streaming lifecycle: MemoryStream → memory
    * sink; `stateful` adds dropDuplicates (8 state partitions, the
    * gates' own setting). Same shape as the gates, zero data work. */
  private def floor(spark: SparkSession, stateful: Boolean): Double = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = System.nanoTime()
    val mem = MemoryStream[Int]
    val src = mem.toDF()
    val out = if (stateful) src.dropDuplicates("value") else src
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, "8")
    val name = "floor_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q =
      try out.writeStream.format("memory").queryName(name)
        .outputMode(if (stateful) "update" else "append").start()
      finally spark.conf.set(key, old)
    try (1 to 3).foreach { i => mem.addData(i); q.processAllAvailable() }
    finally q.stop()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def ms(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // warm: JIT + parquet footers + streaming classloading
    graft.catalog.Tables.all.foreach { t =>
      try graft.catalog.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => } }
    floor(spark, stateful = true)
    def min2(f: => Double): Double = Seq(f, f).min
    val fStateless = min2(floor(spark, stateful = false))
    val fStateful = min2(floor(spark, stateful = true))
    val fNoDataOff = {
      val k = "spark.sql.streaming.noDataMicroBatches.enabled"
      spark.conf.set(k, "false")
      try min2(floor(spark, stateful = true))
      finally spark.conf.set(k, "true")
    }
    val gates = stGates.filter(SparkEntry.queries.contains).map { n =>
      val t = min2 {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        graft.ops.CacheScope.releaseAll()
        (System.nanoTime() - t0) / 1e9
      }
      s""""$n":${ms(t)}"""
    }
    println(s"""{"floor_stateless":${ms(fStateless)},"floor_stateful8":${
      ms(fStateful)},"floor_nodata_off":${ms(fNoDataOff)},"gates":{${
      gates.mkString(",")}},"sf":"$sfDir"}""")
    spark.stop()
  }
}
