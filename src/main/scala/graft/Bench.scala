package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — times every catalog query at the given scale
  * factor and prints ONE JSON line for the driver.
  *
  * SELF-ADJUDICATING ARTIFACTS (three straight rounds of review burned
  * cycles mis-attributing host variance as code regressions):
  *   - a fixed pure-CPU calibration task (pinned-size in-memory
  *     aggregation, no IO) is timed at run START / MIDDLE / END and
  *     emitted as `"calib":[s,m,e]` — the task never changes between
  *     rounds, so a loaded host is detectable INSIDE the artifact:
  *     calib readings far above the committed floor (~0.2 s idle on
  *     this host at cpus=32, see BENCH_NOTES) mean the per-query
  *     numbers in THIS artifact carry the same inflation.
  *   - the full per-query map also lands at a STAMPED path
  *     (`bench_full_<stamp>.json`, stamp = SPARK_GRAFT_BENCH_STAMP or
  *     launch epoch-millis), so a later local Bench invocation can
  *     never clobber a round's driver map (r17 lost one exactly that
  *     way through the fixed `bench_out.json` path, which is kept for
  *     compatibility).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val stamp = sys.env.getOrElse("SPARK_GRAFT_BENCH_STAMP",
      System.currentTimeMillis.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true")) // profiling knob
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // JVM-wide whole-stage-codegen class cache (static conf, default
      // 100 entries). The suite compiles thousands of distinct plans
      // (249 gates; c17 alone runs 288 generated legs × several codegen
      // stages each), so at the default size every pass — including the
      // min-of-2 second pass — Janino-recompiles everything it just
      // evicted. Measured on c17 (quiet host, sf0.1, cpus=32):
      // 25.0 s at 100 entries → 11.9 s at 5000. Scale-neutral: the
      // cache is per-JVM and sized in plans, not data.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // host-calibration probes: pinned-size tasks, identical every
    // round by construction, so their wall times are pure host
    // thermometers. THREE dimensions, because they fail differently
    // (r18 finding, BENCH_NOTES): a ~4-core external load barely
    // moves the CPU probe (64 fat tasks over 32 cores ⇒ ~12%) while
    // inflating many-tiny-job gates 2-7× through scheduler
    // interference — so the artifact also carries a SCHEDULER probe
    // (512 near-empty tasks: wall time ≈ pure task-launch latency)
    // and the kernel's own 1-min load average.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      val s = spark.range(0L, 64000000L, 1L, 64)
        .selectExpr("sum(id * 2 + 1)").head().getLong(0)
      require(s == 64000000L * 64000000L, s"calibration sum drifted: $s")
      (System.nanoTime() - t0) / 1e9
    }
    def calibrateSched(): Double = {
      val t0 = System.nanoTime()
      require(spark.range(0L, 512L, 1L, 512).count() == 512L)
      (System.nanoTime() - t0) / 1e9
    }
    def loadAvg(): Double =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // (host busy cpu-seconds across all cores, own busy cpu-seconds):
    // the END−START deltas give EXTERNAL cpu-seconds burned during the
    // run — the one load signal the bench's own activity cannot
    // pollute (loadavg and the probes both include self)
    def cpuTotals(): (Double, Double) =
      try {
        val hz = 100.0 // USER_HZ
        val v = java.nio.file.Files.readString(
            java.nio.file.Paths.get("/proc/stat"))
          .linesIterator.next().trim.split("\\s+").drop(1).map(_.toDouble)
        // user+nice+system+irq+softirq+steal (skip idle/iowait at 3,4)
        val busy = (v.take(3).sum + v.slice(5, 8).sum) / hz
        // the comm field (field 2, parenthesized) may contain spaces;
        // the robust idiom parses the substring AFTER the last ')':
        // state is then index 0, utime/stime are fields 14/15 overall
        // = indices 11/12 post-paren
        val raw = java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/self/stat"))
        val sf0 = raw.substring(raw.lastIndexOf(')') + 1).trim.split("\\s+")
        (busy, (sf0(11).toDouble + sf0(12).toDouble) / hz)
      } catch { case _: Throwable => (-1.0, -1.0) }

    // JVM/Spark warmup outside the timed region (JIT, codegen cache,
    // parquet footer reads)
    graft.catalog.Tables.all.foreach { t =>
      try graft.catalog.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    calibrate(); calibrateSched() // warm the probes' codegen paths too
    // optional args = subset of query names (local profiling); the
    // driver passes none → full suite
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val unknown = args.filterNot(names0.contains)
    require(unknown.isEmpty, // a typo must not silently run nothing
      s"unknown query name(s): ${unknown.mkString(", ")}")
    val names = if (args.nonEmpty) names0.filter(args.contains) else names0
    // two timed passes per query, report the min: a single contended
    // CPU burst on the host otherwise masquerades as a plan
    // regression (the measurement floor is the plan, not the noise).
    // Each query's window also samples /proc/stat vs /proc/self/stat
    // so the full map carries PER-QUERY external-core attribution —
    // a 48 s streaming gate reading arrives pre-annotated with the
    // load that produced it, no control-run cross-referencing needed.
    def run(name: String): (String, Double, Double) = {
      val c0 = cpuTotals()
      val w0 = System.nanoTime()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case _: Throwable => -1L }
        // cache release is part of the query's honest cost
        finally graft.ops.CacheScope.releaseAll()
        (System.nanoTime() - t0) / 1e9
      }
      val wall = (System.nanoTime() - w0) / 1e9
      val c1 = cpuTotals()
      val extCores =
        if (c0._1 < 0 || c1._1 < 0 || wall <= 0) -1.0
        else math.max(0.0,
          ((c1._1 - c0._1) - (c1._2 - c0._2)) / wall)
      (name, times.min, extCores)
    }
    def probes(): (Double, Double, Double) =
      (calibrate(), calibrateSched(), loadAvg())
    val cpu0 = cpuTotals()
    val pStart = probes()
    val (firstHalf, secondHalf) = names.splitAt(names.length / 2)
    val results0 = firstHalf.map(run)
    val pMid = probes()
    val results = results0 ++ secondHalf.map(run)
    val pEnd = probes()
    val cpu1 = cpuTotals()
    val (extCpu, selfCpu) =
      if (cpu0._1 < 0 || cpu1._1 < 0) (-1.0, -1.0)
      else ((cpu1._1 - cpu0._1) - (cpu1._2 - cpu0._2), cpu1._2 - cpu0._2)
    // ms precision: full-precision doubles once made the one-line JSON
    // outgrow the driver's tail capture, truncating the front before it
    // could parse (r9/r10 artifacts had parsed:null). Locale.ROOT:
    // default-locale formatting emits a comma decimal separator on
    // e.g. de_DE hosts — invalid JSON
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val calib =
      s""""calib":[${ms(pStart._1)},${ms(pMid._1)},${ms(pEnd._1)}],""" +
        s""""calib_sched":[${ms(pStart._2)},${ms(pMid._2)},${ms(pEnd._2)}],""" +
        s""""loadavg":[${ms(pStart._3)},${ms(pMid._3)},${ms(pEnd._3)}],""" +
        s""""ext_cpu_sec":${ms(extCpu)},"self_cpu_sec":${ms(selfCpu)}"""
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    // per-query EXTERNAL core share (avg external busy cores during
    // that query's two-pass window) — the full map's self-adjudication
    // field: a spiked reading with ext≈0 is code, with ext≥1 it is the
    // host (interpretation rule in BENCH_NOTES)
    def ec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qsExt = results.map { case (k, _, e) => "\"" + k + "\":" + ec(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec",$calib,"queries":$qs,"queries_ext_cores":$qsExt,"sf":"$sfDir"}"""
    println(line)
    // the full per-query map lands as files, immune to any stdout
    // tail-capture limit: the fixed path for tooling compatibility AND
    // a stamped path (under bench/, so round artifacts don't accrete
    // at the repo root — retention note in BENCH_NOTES) that no later
    // invocation can overwrite
    val bytes = (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"), bytes)
    val benchDir = java.nio.file.Paths.get("bench")
    java.nio.file.Files.createDirectories(benchDir)
    java.nio.file.Files.write(
      benchDir.resolve(s"bench_full_$stamp.json"), bytes)
    // the driver captures only the TAIL of stdout (~2000 chars) and
    // parses the last line: at 200+ queries the full line outgrows the
    // capture and the artifact records parsed:null. Print LAST a
    // compact line that always fits — total + calibration + the
    // slowest queries, greedily packed under the budget, with a
    // pointer to the full map.
    val budget = 1800
    val slow = results.sortBy(-_._2)
    val head = s"""{"metric":"total","value":${ms(total)},"unit":"sec",$calib,"sf":"$sfDir","nqueries":${results.size},"queries_full":"bench/bench_full_$stamp.json","queries":{"""
    val tail0 = "}}"
    val picked = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = head.length + tail0.length
    slow.foreach { case (k, v, _) =>
      val ent = "\"" + k + "\":" + ms(v)
      if (len + ent.length + 1 <= budget) { picked += ent; len += ent.length + 1 }
    }
    println(head + picked.mkString(",") + tail0)
    spark.stop()
  }
}
