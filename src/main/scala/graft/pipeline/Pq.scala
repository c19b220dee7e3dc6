package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PqExprs
import graft.ops.{CacheScope, Kernels}

/** Product-quantization ANN (FAISS-PQ): split each vector into `m`
  * subvectors, train a small codebook per subspace on a bounded
  * driver-local sample, represent every corpus vector by `m` codeword
  * indices, and answer queries with asymmetric-distance (ADC) scans —
  * each candidate costs `m` table lookups instead of `dims` multiplies
  * — followed by an exact cosine re-rank of the ADC survivors.
  *
  * Scale shape: the encoded corpus is `m` small ints per vector (8
  * codes ≈ 8 B vs 512 B for a 64-dim double vector), so the scan side
  * shuffles/holds a ~64× compressed representation; full vectors are
  * touched only for the `nCandidates` re-rank rows per query. Training
  * is driver-local on a reservoir sample (same posture as
  * [[IvfIndex]]) — no distributed ML iterations; encoding is one
  * codegen projection pass, no join, no shuffle. Composes with IVF
  * (coarse cells + PQ within cells) — here the flat-PQ form, which is
  * already sublinear in *work* per candidate rather than in candidates
  * scanned.
  */
class PqIndex private (val codes: DataFrame,
                       val codebooks: Array[Array[Array[Double]]],
                       id: String, val builtAt: Long,
                       residualOf: Option[IvfIndex] = None) {

  /** Cosine top-k per query: ADC top-`nCandidates` candidate scan over
    * the encoded corpus (broadcast query tables), then exact cosine
    * re-rank of the candidates only.
    *
    * Candidate-stage ties on ADC distance break to the HIGHER
    * neighbor id — a query's exact duplicate shares its code and
    * therefore attains the globally minimal ADC distance, so planted
    * high-id twins are guaranteed candidates (the e6 oracle design). */
  def topK(queries: DataFrame, vec: String, k: Int,
           nCandidates: Int = 256): DataFrame = {
    require(residualOf.isEmpty,
      "residual-encoded codes are relative to coarse cells — use topKProbed")
    val q = Kernels.ensureParallelism(
      queries.select(col(id).as("query_id"), Similarity.vecD(col(vec)).as("qv")))
      .withColumn("dt", PqExprs.pq_dist_table(col("qv"), codebooks))
    // ADC scan: every (query, corpus) pair, but each pair is m lookups
    // over the broadcast per-query table — the classic PQ trade. The
    // corpus side never shuffles; candidates carry (ids, adc) only.
    val scored = codes.crossJoin(broadcast(q.select(col("query_id"), col("dt"))))
      .filter(col(id) =!= col("query_id"))
      .select(col("query_id"), col(id).as("neighbor_id"),
        PqExprs.pq_adc(col("code"), col("dt")).as("adc"))
    rerank(scored, q, k, nCandidates)
  }

  /** IVF-PQ composition (the FAISS-IVFPQ architecture): the ADC scan
    * is restricted to each query's `nProbe` nearest coarse cells
    * instead of the whole corpus — candidates drop from N to
    * ~N·nProbe/nCells, and the join is a hash join on the cell id
    * rather than a broadcast cross. At a billion vectors that is the
    * difference between scanning 10⁹ and 10⁷ codes per query batch.
    * Both indexes must be built over the same corpus and id column.
    *
    * For a [[PqIndex.buildResidual]] index the ADC table is computed
    * per (query, probed cell) from the query's residual to that cell's
    * centroid — still on the broadcast side, still one codegen
    * projection; `coarse` must be the index the residuals were encoded
    * against. */
  def topKProbed(queries: DataFrame, vec: String, coarse: IvfIndex,
                 nProbe: Int, k: Int, nCandidates: Int = 256,
                 allowed: Option[DataFrame] = None): DataFrame = {
    require(residualOf.forall(_ eq coarse),
      "a residual PQ index must be probed with its build-time coarse index")
    val q0 = Kernels.ensureParallelism(
      queries.select(col(id).as("query_id"), Similarity.vecD(col(vec)).as("qv")))
    // FILTERED search: the same live-cell list pruning as
    // IvfIndex.topK — under a geometry-correlated filter the probe
    // budget must go to cells that still hold candidates
    def probeEx: Column = coarse.probeExpr(col("qv"), nProbe, allowed)
    val q = residualOf match {
      case None =>
        // one ADC table per query, shared by all its probed cells
        q0.withColumn("dt", PqExprs.pq_dist_table(col("qv"), codebooks))
          .withColumn("cell", explode(probeEx))
      case Some(c) =>
        // per-(query, cell) ADC table over the residual in that cell —
        // the same normalized space the residuals were encoded in
        q0.withColumn("cell", explode(probeEx))
          .withColumn("dt", PqExprs.pq_dist_table(
            graft.functions.VectorExprs.vec_sub(
              graft.functions.VectorExprs.l2_normalize(col("qv")),
              element_at(c.centroidLit, col("cell") + 1)), codebooks))
    }
    val coded0 = codes.join(
      coarse.cells.select(col(id), col("cell")), Seq(id))
    val coded = allowed.fold(coded0)(a =>
      coded0.join(a.select(col(id)), Seq(id), "left_semi"))
    val scored = coded.join(broadcast(
        q.select(col("query_id"), col("cell"), col("dt"))), Seq("cell"))
      .filter(col(id) =!= col("query_id"))
      .select(col("query_id"), col(id).as("neighbor_id"),
        PqExprs.pq_adc(col("code"), col("dt")).as("adc"))
    rerank(scored, q, k, nCandidates)
  }

  /** Shared tail of both scan variants: ADC top-`nCandidates`
    * candidate cut, exact cosine re-rank over candidates only (full
    * vectors rejoined for ≤ nCandidates rows per query), ranked top-k.
    * `q` may carry one row per (query, probed cell) — the qv side is
    * de-duplicated before the re-rank join. */
  private def rerank(scored: DataFrame, q: DataFrame, k: Int,
                     nCandidates: Int): DataFrame = {
    val cand = Kernels.topKPerKeyAgg(scored, Seq("query_id"),
      Seq(-col("adc"), col("neighbor_id")), nCandidates)
    val withVecs = cand
      .join(codes.select(col(id).as("neighbor_id"), col("cv")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv")).distinct()), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("cos"))
    Kernels.topKPerKeyRanked(withVecs, Seq("query_id"),
      Seq(col("cos"), -col("neighbor_id")), k)
  }

  /** Persist the index so later sessions query WITHOUT retraining
    * (same posture and staleness contract as [[IvfIndex.save]]): the
    * per-subspace codebooks land as a tiny parquet
    * (m · nWords rows), the encoded corpus as a parquet of
    * (id, code, cv), under a fresh `snap_*` with an atomic `_latest`
    * flip. The snapshot reflects the corpus AS OF [[builtAt]] —
    * rebuild + re-save when the corpus moves. */
  def save(path: String): Unit = {
    val s = codes.sparkSession
    import s.implicits._
    val snap = IndexIo.newSnap()
    val dir = s"$path/$snap"
    (for {
      (book, j) <- codebooks.zipWithIndex
      (word, w) <- book.zipWithIndex
    } yield (j, w, word.toSeq)).toSeq
      .toDF("subspace", "word", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    IndexIo.writeMeta(s, dir, Seq(
      "kind" -> "pq", "id" -> id,
      "m" -> codebooks.length.toString,
      "built_at" -> builtAt.toString) ++
      // a residual index is only meaningful with ITS coarse quantizer:
      // record its centroid fingerprint so loadResidual can verify the
      // caller plugged the right one back in
      residualOf.map(c => "residual_coarse" ->
        PqIndex.centroidFingerprint(c.centroids).toString))
    IndexIo.flip(s, path, snap)
  }

  /** Release the cached codes frame (queries recompute afterwards). */
  def close(): Unit = codes.unpersist(blocking = false)
}

object PqIndex {

  /** Train the `m` per-subspace codebooks CONCURRENTLY on the driver:
    * each subspace's k-means is an independent, seeded, deterministic
    * computation over its own slice of the sample (seed + j), so
    * running them on a small pool changes nothing but wall-clock —
    * sequential training serialized ~m × 5 Lloyd's rounds of pure
    * driver CPU while 31 cores idled. Results land by index, so the
    * codebook array is bit-identical to the sequential build. */
  private def trainCodebooksParallel(m: Int)(
      f: Int => Array[Array[Double]]): Array[Array[Array[Double]]] = {
    if (m <= 1) return Array.tabulate(m)(f)
    import scala.concurrent.{Await, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(m, Runtime.getRuntime.availableProcessors()))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try Await.result(
      Future.sequence((0 until m).toList.map(j => Future(f(j)))),
      scala.concurrent.duration.Duration.Inf).toArray
    finally pool.shutdown()
  }

  /** Load a [[PqIndex.save]]d index: codebooks re-collected from the
    * tiny parquet (driver memory O(m · nWords · dims/m) = O(nWords ·
    * dims)), the encoded corpus read lazily and registered in
    * [[graft.ops.CacheScope]]. No training runs. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
    val (meta, idx) = loadCurrent(spark, path, residualOf = None)
    require(!meta.contains("residual_coarse"),
      "residual PQ index — load with PqIndex.loadResidual(spark, path, coarse)")
    idx
  }

  private def loadCurrent(spark: org.apache.spark.sql.SparkSession,
                          path: String, residualOf: Option[IvfIndex])
      : (Map[String, String], PqIndex) = {
    val snap = IndexIo.currentSnap(spark, path).getOrElse(
      throw new java.io.FileNotFoundException(s"$path/_latest"))
    val dir = s"$path/$snap"
    val meta = IndexIo.readMeta(spark, dir)
    require(meta.get("kind").contains("pq"), s"not a PQ index: $dir")
    val id = meta("id")
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("subspace"), col("word"), col("c")).collect()
    val codebooks = rows.groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray))
    require(codebooks.length == meta("m").toInt, s"corrupt codebooks in $dir")
    val codes = CacheScope.persist(
      spark.read.parquet(s"$dir/codes")
        .select(col(id), col("code"), col("cv")))
    (meta, new PqIndex(codes, codebooks, id, meta("built_at").toLong, residualOf))
  }

  /** Drop all persisted snapshots except the current one. */
  def vacuum(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    IndexIo.vacuum(spark, path)

  /** Train per-subspace codebooks driver-locally and encode the corpus
    * in one distributed codegen pass. `dims` must be divisible by `m`.
    *
    * The persisted codes frame keeps the full vector alongside the
    * code for the re-rank fetch; a storage-backed deployment would
    * hold codes in memory and fetch vectors from the table — the plan
    * shape (candidates-only vector access) is the same. */
  def build(corpus: DataFrame, id: String, vec: String,
            m: Int = 8, nWords: Int = 256, seed: Long = 42L,
            maxTrainRows: Int = 100000): PqIndex = {
    require(m > 0 && nWords > 1)
    val base = CacheScope.persist(Kernels.ensureParallelism(
      corpus.select(col(id), Similarity.vecD(col(vec)).as("cv"))))
    val sample = Sampling.boundedVectorSample(base.select(col("cv")), maxTrainRows, seed)
    val dims = sample.head.length
    require(dims % m == 0, s"dims ($dims) must be divisible by m ($m)")
    val sub = dims / m
    val codebooks = trainCodebooksParallel(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      IvfIndex.localKMeans(pts, nWords, iters = 5, seed = seed + j)
    }
    val encoded = CacheScope.persist(
      base.withColumn("code", PqExprs.pq_encode(col("cv"), codebooks))
        .select(col(id), col("code"), col("cv")))
    new PqIndex(encoded, codebooks, id, System.currentTimeMillis())
  }

  /** RESIDUAL IVF-PQ (the FAISS-IVFPQ default): encode each vector's
    * residual to its assigned coarse centroid instead of the vector
    * itself. Residuals concentrate near the origin, so the same code
    * budget spends its codewords on a much tighter distribution —
    * better recall at fixed m·log₂(nWords) bits. Residuals live in the
    * coarse quantizer's NORMALIZED space (see [[IvfIndex.build]]);
    * [[PqIndex.topKProbed]] computes the matching per-cell query
    * residual. Query only via `topKProbed` with the SAME `coarse`. */
  def buildResidual(corpus: DataFrame, id: String, vec: String,
                    coarse: IvfIndex, m: Int = 8, nWords: Int = 256,
                    seed: Long = 42L, maxTrainRows: Int = 100000): PqIndex = {
    require(m > 0 && nWords > 1)
    val norm = graft.functions.VectorExprs.l2_normalize _
    val sub = graft.functions.VectorExprs.vec_sub _
    // coarse.cells is already cached (id, cell, cv) — reuse it; the
    // residual is one codegen projection on top
    val resid = CacheScope.persist(coarse.cells.withColumn("rv",
      sub(norm(col("cv")), element_at(coarse.centroidLit, col("cell") + 1))))
    val sample = Sampling.boundedVectorSample(
      resid.select(col("rv")), maxTrainRows, seed)
    val dims = sample.head.length
    require(dims % m == 0, s"dims ($dims) must be divisible by m ($m)")
    val subLen = dims / m
    val codebooks = trainCodebooksParallel(m) { j =>
      val pts = sample.map(v =>
        java.util.Arrays.copyOfRange(v, j * subLen, (j + 1) * subLen))
      IvfIndex.localKMeans(pts, nWords, iters = 5, seed = seed + j)
    }
    val encoded = CacheScope.persist(
      resid.withColumn("code", PqExprs.pq_encode(col("rv"), codebooks))
        .select(col(id), col("code"), col("cv")))
    new PqIndex(encoded, codebooks, id, System.currentTimeMillis(),
      residualOf = Some(coarse))
  }

  /** Load a [[buildResidual]] index, plugging its coarse quantizer
    * back in — the fingerprint recorded at save time must match
    * `coarse`'s centroids, so a drifted/rebuilt quantizer is rejected
    * instead of silently mis-decoding every residual. */
  def loadResidual(spark: org.apache.spark.sql.SparkSession, path: String,
                   coarse: IvfIndex): PqIndex = {
    val (meta, idx) = loadCurrent(spark, path, residualOf = Some(coarse))
    val expected = meta.getOrElse("residual_coarse",
      throw new IllegalArgumentException(s"$path is not a residual PQ index"))
    require(expected == centroidFingerprint(coarse.centroids).toString,
      "coarse quantizer mismatch: this residual index was built against " +
        "different centroids")
    idx
  }

  private[pipeline] def centroidFingerprint(cents: Array[Array[Double]]): Long =
    cents.flatten.foldLeft(17L)((h, d) =>
      h * 31L + java.lang.Double.doubleToLongBits(d))
}
