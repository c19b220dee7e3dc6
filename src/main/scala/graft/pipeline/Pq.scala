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
                       id: String, val builtAt: Long) {

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
    * Both indexes must be built over the same corpus and id column. */
  def topKProbed(queries: DataFrame, vec: String, coarse: IvfIndex,
                 nProbe: Int, k: Int, nCandidates: Int = 256): DataFrame = {
    val q = Kernels.ensureParallelism(
      queries.select(col(id).as("query_id"), Similarity.vecD(col(vec)).as("qv")))
      .withColumn("dt", PqExprs.pq_dist_table(col("qv"), codebooks))
      .withColumn("cell", explode(coarse.probeCells(col("qv"), nProbe)))
    val coded = codes.join(
      coarse.cells.select(col(id), col("cell")), Seq(id))
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
    val cand = Kernels.topKPerKey(scored, Seq("query_id"),
      Seq(-col("adc"), col("neighbor_id")), nCandidates)
    val withVecs = cand
      .join(codes.select(col(id).as("neighbor_id"), col("cv")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv")).distinct()), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("cos"))
    Kernels.topKPerKey(withVecs, Seq("query_id"),
        Seq(col("cos"), -col("neighbor_id")), k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
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
      "built_at" -> builtAt.toString))
    IndexIo.flip(s, path, snap)
  }

  /** Release the cached codes frame (queries recompute afterwards). */
  def close(): Unit = codes.unpersist(blocking = false)
}

object PqIndex {

  /** Load a [[PqIndex.save]]d index: codebooks re-collected from the
    * tiny parquet (driver memory O(m · nWords · dims/m) = O(nWords ·
    * dims)), the encoded corpus read lazily and registered in
    * [[graft.ops.CacheScope]]. No training runs. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
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
    new PqIndex(codes, codebooks, id, meta("built_at").toLong)
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
    val codebooks = Array.tabulate(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      IvfIndex.localKMeans(pts, nWords, iters = 5, seed = seed + j)
    }
    val encoded = CacheScope.persist(
      base.withColumn("code", PqExprs.pq_encode(col("cv"), codebooks))
        .select(col(id), col("code"), col("cv")))
    new PqIndex(encoded, codebooks, id, System.currentTimeMillis())
  }
}
