package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Z-ORDER (Morton-curve) clustered layout — MULTI-dimensional file
  * skipping, the capability [[Layout]]'s single-axis time zones can't
  * provide: a table sorted by (a, b) prunes scans on `a` but not on
  * `b` alone, while interleaving the two dimensions' bits keeps rows
  * close in BOTH axes, so per-file min/max zones stay tight on each
  * column and a range predicate on EITHER prunes files (the Delta
  * `OPTIMIZE ZORDER BY` / Iceberg sort-order idea).
  *
  * Mechanics: each column is quantized to 8-bit bins — equi-depth
  * (approximate-quantile boundaries, skew-robust, the default) or
  * uniform min..max widths — the bin ids are bit-interleaved into a
  * 16-bit z-value, and the frame is range-partitioned + sorted by z
  * into `filesTarget` files. The zone
  * manifest (one row per file: min/max of BOTH raw columns) commits
  * through [[SnapshotManifest]], so creation is observable only at the
  * final pointer flip and [[read]] prunes from metadata without
  * opening a single data footer.
  *
  * This is the destructive table-CREATE path (the
  * [[Layout.writeClusteredZoned]] posture): rewrite-to-recluster, no
  * incremental append — z-order maintenance at scale is a compaction
  * concern, and [[Layout.compact]] shows the snapshot-flip shape it
  * would reuse.
  */
object ZOrder {

  private val Bits = 8 // 256 bins per dimension → 16-bit z-values

  /** Interleave the low `bits` bits: `a` on even positions, `b` odd —
    * a fold of shift/mask ops, fully codegen'd, no UDF. */
  private[catalog] def interleaveBits(a: Column, b: Column,
                                      bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(
          shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(
          shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Uniform bin id in [0, 2^Bits) over the observed [mn, mx]. */
  private def bin(c: Column, mn: Double, mx: Double): Column = {
    val n = 1 << Bits
    val width = math.max((mx - mn) / n, Double.MinPositiveValue)
    least(lit(n - 1L), greatest(lit(0L),
      floor((c.cast("double") - lit(mn)) / lit(width)).cast("long")))
  }

  /** Write `df` z-ordered on numeric columns (`c1`, `c2`).
    * `equiDepth = true` (default) bins each dimension by approximate
    * quantiles — EQUI-DEPTH bins: on a heavy-tailed column, uniform
    * widths collapse the dense region into one bin (its z-locality,
    * and with it per-file zone tightness, is lost: every dense-region
    * range query overlaps every dense file), while equi-depth spends
    * the full bin budget where the data actually lives. Both columns'
    * boundaries come from ONE `percentile_approx` aggregation pass
    * (mergeable KLL-style sketch, bounded driver memory), and the
    * per-row bin id is a codegen binary search
    * ([[graft.functions.BinExprs.sorted_bin]]) — O(log bins), inside
    * whole-stage codegen, no per-row allocation. `equiDepth = false`
    * uses uniform min..max widths (one tiny agg, fine for evenly
    * spread data). The manifest stores RAW column min/max per file
    * either way, so [[read]] is binning-agnostic. */
  def write(df: DataFrame, path: String, c1: String, c2: String,
            filesTarget: Int = 64, equiDepth: Boolean = true): Unit = {
    val spark = df.sparkSession
    val n = 1 << Bits
    val z =
      if (equiDepth) {
        val probs = typedlit((1 until n).map(_.toDouble / n))
        val st = df.agg(
          percentile_approx(col(c1).cast("double"), probs, lit(1000)),
          percentile_approx(col(c2).cast("double"), probs, lit(1000))).head
        // percentile_approx yields NULL for an empty frame or an
        // all-null column — degrade to no boundaries (single bin 0)
        // instead of NPEing, like the uniform path's clamp does
        def bounds(i: Int): Array[Double] =
          if (st.isNullAt(i)) Array.empty[Double]
          else st.getSeq[Double](i).toArray
        interleaveBits(
          graft.functions.BinExprs.sorted_bin(col(c1), bounds(0)),
          graft.functions.BinExprs.sorted_bin(col(c2), bounds(1)), Bits)
      } else {
        val st = df.agg(
          min(col(c1)).cast("double"), max(col(c1)).cast("double"),
          min(col(c2)).cast("double"), max(col(c2)).cast("double")).head
        def d(i: Int): Double = // null agg (empty/all-null) → bin 0
          if (st.isNullAt(i)) 0.0 else st.getDouble(i)
        interleaveBits(
          bin(col(c1), d(0), d(1)),
          bin(col(c2), d(2), d(3)), Bits)
      }
    df.withColumn("__z", z)
      .repartitionByRange(filesTarget, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    // per-file 2-D zones, natively typed; bounded by FILE count
    val agg = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c1)).as("c1min"), max(col(c1)).as("c1max"),
        min(col(c2)).as("c2min"), max(col(c2)).as("c2max"))
    val fs = SnapshotManifest.fsOf(spark, path)
    val qroot = fs.makeQualified(new Path(path)).toString
    val rows = agg.collect().map { r =>
      val p = fs.makeQualified(
        new Path(new java.net.URI(r.getString(0)))).toString
      Row(p.stripPrefix(qroot).stripPrefix("/"),
        r.get(1), r.get(2), r.get(3), r.get(4))
    }
    val mDir = new Path(path, SnapshotManifest.ManifestsDir)
    fs.mkdirs(mDir)
    val part = SnapshotManifest.newPartName()
    val tmp = new Path(mDir, s".tmp_$part")
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
      .coalesce(1).write.parquet(tmp.toString)
    if (!fs.rename(tmp, new Path(mDir, part)))
      throw new java.io.IOException(s"zorder manifest rename failed: $part")
    SnapshotManifest.commit(spark, path, Seq(part))
  }

  /** The live 2-D zone manifest. */
  def manifest(spark: SparkSession, path: String): DataFrame =
    SnapshotManifest.currentParts(spark, path).map { parts =>
      spark.read.parquet(
        parts.map(p => SnapshotManifest.partPath(path, p)): _*)
    }.getOrElse(throw new java.io.FileNotFoundException(
      s"$path/${SnapshotManifest.LatestFile}"))

  /** Manifest rows surviving the zone overlap test — the files a
    * pruned read opens (exposed for plan/skip assertions). */
  def pruneZones(spark: SparkSession, path: String,
                 c1Range: Option[(Column, Column)],
                 c2Range: Option[(Column, Column)]): DataFrame = {
    val m = manifest(spark, path)
    val p1 = c1Range.fold(m) { case (lo, hi) =>
      m.filter(col("c1max") >= lo && col("c1min") <= hi) }
    c2Range.fold(p1) { case (lo, hi) =>
      p1.filter(col("c2max") >= lo && col("c2min") <= hi) }
  }

  /** Pruned read: zone-skip on either/both dimensions from manifest
    * metadata, then re-apply the exact predicates — always ≡ the
    * plain filter over the full table (the s16 oracle). */
  def read(spark: SparkSession, path: String, c1: String, c2: String,
           c1Range: Option[(Column, Column)] = None,
           c2Range: Option[(Column, Column)] = None): DataFrame = {
    val files = pruneZones(spark, path, c1Range, c2Range)
      .select(col("file")).collect()
      .map(r => new Path(path, r.getString(0)).toString
        .replaceAll("([{}\\[\\]*?\\\\])", "\\\\$1"))
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.option("basePath", path).parquet(files.toIndexedSeq: _*)
    val k1 = c1Range.fold(base) { case (lo, hi) =>
      base.filter(col(c1) >= lo && col(c1) <= hi) }
    c2Range.fold(k1) { case (lo, hi) =>
      k1.filter(col(c2) >= lo && col(c2) <= hi) }
  }
}
