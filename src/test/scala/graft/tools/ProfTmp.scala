package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler (test scope, never shipped in main): run
  * with `sbt "Test/runMain graft.tools.ProfTmp"`; env knobs select the
  * scenario (PROF_FUZZ / PROF_S21 / default delete-vector lifecycle). */
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // count spark jobs per phase
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val durs = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime())
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s0 = starts.remove(j.jobId)
          if (s0 != null) durs.add((System.nanoTime() - s0) / 1e9)
        }
      })
    def phase[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); durs.clear()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val ds = durs.asScala.toSeq.sorted.reverse
      println(f"PHASE $name%-28s ${dt}%7.3f s  jobs=${jobs.get() - j0}  " +
        f"jobsum=${ds.sum}%6.3f top=[${ds.take(6).map(d => f"$d%.2f").mkString(",")}]")
      r
    }

    def t(s: SparkSession, d: String, n: String) =
      graft.catalog.Tables.load(s, d, n)
    // warmup
    graft.catalog.Tables.all.foreach { n =>
      try t(spark, dir, n).count() catch { case _: Throwable => } }

    if (sys.env.contains("PROF_FUZZ")) {
      import org.apache.spark.sql.functions.{count => cnt, _}
      // mimic digestAll's scoped conf
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val r = graft.fuzz.QueryFuzzer.digestAll(spark, dir).collect()
        println(f"FUZZ digestAll pass$pass total=${(System.nanoTime()-t0)/1e9}%.2f rows=${r.length}")
      }
      // replicate digestAll's two phases with timers
      locally {
        val t0 = System.nanoTime()
        val legs = graft.fuzz.QueryFuzzer.corpus.map { q =>
          q.build(spark, dir).agg(
            cnt(lit(1)).cast("long").as("n_rows"))
        }
        val t1 = System.nanoTime()
        println(f"FUZZ seq-build ${(t1-t0)/1e9}%.2f s for ${legs.size} legs")
      }
      // now per-leg anatomy, sequential, AQE off like digestAll
      graft.ops.ConfScope.withScopedConf(spark,
        Seq("spark.sql.adaptive.enabled" -> "false",
          "spark.sql.shuffle.partitions" -> "8")) {
        val legs = Seq(0, 50, 130, 200, 260)
        (1 to 2).foreach { pass =>
          legs.foreach { i =>
            val q = graft.fuzz.QueryFuzzer.query(i)
            val t0 = System.nanoTime()
            val df = q.build(spark, dir).agg(
              cnt(lit(1)).cast("long").as("n_rows"))
            val t1 = System.nanoTime()
            val ep = df.queryExecution.executedPlan // force planning
            val t2 = System.nanoTime()
            df.collect()
            val t3 = System.nanoTime()
            println(f"FUZZ leg$i pass$pass build=${(t1-t0)/1e6}%.0fms plan=${(t2-t1)/1e6}%.0fms exec=${(t3-t2)/1e6}%.0fms")
          }
        }
      }
      spark.stop(); return
    }
    if (sys.env.contains("PROF_S21")) {
      (1 to 2).foreach { pass =>
        println(s"== s21 pass $pass ==")
        val base = System.getProperty("java.io.tmpdir") + s"/prof_repl_$pass"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val srcPath = base + "/src"; val tgtPath = base + "/tgt"
        val src = t(spark, dir, "orders").select(
          col("o_orderstatus").as("symbol"),
          to_date(col("o_orderdate")).as("ship"),
          col("o_orderkey"), col("o_totalprice").as("qty"))
        val cut = lit("1997-01-01").cast("date")
        val initial = src.filter(col("ship") < cut)
        phase("write-src") { graft.catalog.Layout.writeClusteredZoned(
          initial, srcPath, "symbol", "ship", numBuckets = 4, filesPerBucket = 4) }
        phase("write-tgt") { graft.catalog.Layout.writeClusteredZoned(
          initial, tgtPath, "symbol", "ship", numBuckets = 4, filesPerBucket = 4) }
        val snap1 = graft.catalog.Layout.snapshots(spark, srcPath).last
        phase("append-src") { graft.catalog.Layout.appendClusteredZoned(
          src.filter(col("ship") >= cut), srcPath, "symbol", "ship",
          numBuckets = 4, filesPerBucket = 4) }
        phase("delete-src") { graft.catalog.Layout.delete(spark, srcPath, "ship",
          pmod(col("o_orderkey"), lit(7)) === 0) }
        val snap3 = graft.catalog.Layout.snapshots(spark, srcPath).last
        val feed = phase("changes-build") {
          graft.catalog.Layout.changes(spark, srcPath, snap1, snap3) }
        phase("applyChanges") { graft.catalog.Layout.applyChanges(
          feed, tgtPath, "symbol", "ship", keys = Seq("o_orderkey"),
          numBuckets = 4, filesPerBucket = 4,
          epoch = Some(s"${snap1}_$snap3")) }
        phase("read-agg") { graft.catalog.Layout
          .read(spark, tgtPath, "symbol", "ship", numBuckets = 4)
          .groupBy(col("symbol"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("symbol").collect() }
      }
      spark.stop(); return
    }
    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      val path = System.getProperty("java.io.tmpdir") + s"/prof_dv_$pass"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val src = t(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0).select(
        col("l_returnflag").as("symbol"),
        to_date(col("l_shipdate")).as("ship"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"))
      phase("writeClusteredZoned") {
        graft.catalog.Layout.writeClusteredZoned(
          src, path, "symbol", "ship", numBuckets = 4, filesPerBucket = 4)
      }
      phase("delete1") {
        graft.catalog.Layout.delete(spark, path, "ship", col("qty") < 10)
      }
      phase("delete2") {
        graft.catalog.Layout.delete(spark, path, "ship",
          col("ship") >= lit("1998-06-01").cast("date"))
      }
      def agg(p: String) = graft.catalog.Layout
        .read(spark, path, "symbol", "ship", numBuckets = 4)
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n"),
          sum(col("qty").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .withColumn("phase", lit(p))
      phase("agg-dv-read") { agg("dv").collect() }
      phase("compact") {
        graft.catalog.Layout.compact(spark, path, "symbol", "ship",
          filesPerBucket = 4)
      }
      phase("agg-folded-read") { agg("folded").collect() }
    }
    spark.stop()
  }
}
