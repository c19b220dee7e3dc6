package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{CacheScope, Kernels}
import scala.util.Random

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, random-hyperplane
  * LSH bucketing as the 100 TB path (candidates shuffle on bucket,
  * never all-pairs).
  */
object Similarity {

  /** float[] → double[] (compute similarities in double). */
  def vecD(c: Column): Column = transform(c, x => x.cast("double"))

  /** One-pass codegen'd dot product (graft.functions.DotProduct) —
    * the HOF `aggregate(zip_with(...))` form evaluates its lambda
    * interpreted per element; the custom expression is a tight loop. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** One-pass codegen'd cosine; bit-identical to the sequential
    * dot/(√|a|²·√|b|²) formulation the DuckDB oracle uses. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosine_sim(a, b)

  /** Exact cosine top-k: each query scored against the whole corpus.
    * The query set is broadcast (it is small by contract); the corpus
    * is scanned once; per-query selection is the mergeable bounded
    * heap ([[Kernels.topKPerKeyRanked]]) — map-side combine discards
    * below-top-k rows before the shuffle, so O(|Q|·k) rows move, not
    * the scored frame. O(|Q|·|C|·d) compute, zero corpus shuffle. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(id).as("query_id"), vecD(col(vec)).as("qv")))
    val c = corpus.select(col(id).as("neighbor_id"), vecD(col(vec)).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    Kernels.topKPerKeyRanked(
      scored.select(col("query_id"), col("neighbor_id"), col("cos")),
      Seq("query_id"), Seq(col("cos"), -col("neighbor_id")), k)
  }

  /** PROGRESSIVE-DIMENSION re-rank — the Matryoshka/MRL serving trick
    * (Kusupati et al., "Matryoshka Representation Learning", NeurIPS
    * 2022): stage 1 scores the WHOLE corpus on only the first
    * `dPrefix` dims and keeps `candidates` ids per query; stage 2
    * re-ranks just the survivors with FULL-dimension exact cosine.
    * MRL-trained embeddings order front-load information, so a small
    * candidate multiple of k preserves recall at dPrefix/d of the
    * stage-1 FLOPs; candidates = |corpus| makes the result provably
    * the exact top-k.
    *
    * Scale shape: stage 1 keeps e1's zero-corpus-shuffle scan but a
    * d/dPrefix cheaper score per row (a production deployment
    * additionally MATERIALIZES the prefix as its own column/table so
    * the scan's bytes shrink too — here the prefix is sliced in the
    * projection, which saves compute, not I/O); stage 2 touches full
    * vectors for only |Q|·candidates rows via a keyed join the
    * planner broadcasts on the tiny candidate side — the corpus is
    * never shuffled in either stage. The same filter-then-verify
    * shape as PQ's ADC + re-rank (e6), with dimension prefixes
    * instead of quantization as the cheap stage. */
  def progressiveTopK(corpus: DataFrame, queries: DataFrame,
                      id: String, vec: String, k: Int,
                      dPrefix: Int, candidates: Int): DataFrame = {
    require(dPrefix >= 1, "progressiveTopK: dPrefix must be >= 1")
    require(candidates >= k, "progressiveTopK: candidates must be >= k")
    val q = broadcast(queries.select(col(id).as("query_id"),
      vecD(col(vec)).as("qv")))
    val c = corpus.select(col(id).as("neighbor_id"), vecD(col(vec)).as("cv"))
    // stage 1: prefix-dim filter — only (query, neighbor, score) out
    val cand = Kernels.topKPerKeyAgg(
      c.crossJoin(q)
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(slice(col("qv"), 1, dPrefix),
            slice(col("cv"), 1, dPrefix)).as("pcos")),
      Seq("query_id"), Seq(col("pcos"), -col("neighbor_id")), candidates)
      .select(col("query_id"), col("neighbor_id"))
    // stage 2: exact re-rank on full dims, candidates only
    val rescored = cand
      .join(c, Seq("neighbor_id"))
      .join(q.withColumnRenamed("qv", "__qv"), Seq("query_id"))
      .withColumn("cos", cosine(col("__qv"), col("cv")))
    Kernels.topKPerKeyRanked(
      rescored.select(col("query_id"), col("neighbor_id"), col("cos")),
      Seq("query_id"), Seq(col("cos"), -col("neighbor_id")), k)
  }

  /** Deterministic random-hyperplane weights: `planes` hyperplanes in
    * `dims` dimensions from a fixed seed. */
  def hyperplanes(planes: Int, dims: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(planes)(Seq.fill(dims)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of a vector under the hyperplanes — bit p set
    * iff dot(v, w_p) > 0. Cosine-preserving LSH: P(bit equal) =
    * 1 - angle/π. */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val w = typedlit(planes)
    val bits = planes.indices.map { p =>
      when(dot(vec, element_at(w, p + 1)) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Near-duplicate pairs by cosine ≥ `minCosine`, found via LSH
    * banding (candidates = pairs sharing any band of the signature)
    * then exact cosine verification on candidates only.
    *
    * Recall for a true pair at cosine c: per-bit agreement
    * q = 1 - arccos(c)/π; P(candidate) = 1 - (1 - q^r)^bands. With
    * 16 planes, 4 bands × 4 bits, c = 0.3 → ~40%; c = 0.7 → ~97%.
    * Raise bands (or multi-probe) for higher recall; the exact-verify
    * step keeps precision at 100%. */
  def lshNearDupPairs(df: DataFrame, id: String, vec: String,
                      minCosine: Double, planes: Int = 16, bands: Int = 4,
                      seed: Long = 42L, dims: Option[Int] = None): DataFrame = {
    require(planes % bands == 0)
    val width = planes / bands
    val mask = (1L << width) - 1
    // pass `dims` explicitly when known — the fallback probe is a
    // driver-side job at plan-construction time
    val hp = hyperplanes(planes, dims.getOrElse(dimsOf(df, vec)), seed)
    // read by the banding explode and twice for verify (caller
    // releases the CacheScope after its terminal action)
    val sig = CacheScope.persist(
      Kernels.ensureParallelism(df.select(col(id), vecD(col(vec)).as("v")))
        .withColumn("sig", lshSignature(col("v"), hp)))

    val banded = sig.select(col(id), col("v"),
      explode(array((0 until bands).map(j =>
        struct(lit(j).as("bidx"),
          shiftright(col("sig"), j * width).bitwiseAND(mask).as("bucket"))): _*))
        .as("bb"))
      .select(col(id), col("v"), col("bb.bidx"), col("bb.bucket"))
    // dedup candidate PAIRS (ids only — never haul the vectors
    // through the distinct), then fetch vectors back via broadcastable
    // id joins for the exact verify
    val l = banded.select(col(id).as("id1"), col("bidx"), col("bucket"))
    val r = banded.select(col(id).as("id2"), col("bidx"), col("bucket"))
    val cand = l.join(r, Seq("bidx", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val vecs = sig.select(col(id), col("v"))
    cand
      .join(vecs.select(col(id).as("id1"), col("v").as("v1")), Seq("id1"))
      .join(vecs.select(col(id).as("id2"), col("v").as("v2")), Seq("id2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .filter(col("cos") >= minCosine)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** IVF-style bucketed ANN: corpus pre-partitioned by LSH signature
    * band ("coarse cells"); a query probes only its own cells'
    * members, then ranks exactly. Trades recall for touching
    * |corpus|/2^width of the data per band instead of all of it. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, planes: Int = 16, bands: Int = 4, seed: Long = 42L,
              dims: Option[Int] = None): DataFrame = {
    require(planes % bands == 0)
    val width = planes / bands
    val mask = (1L << width) - 1
    val hp = hyperplanes(planes, dims.getOrElse(dimsOf(corpus, vec)), seed)
    def banded(df: DataFrame, idAs: String, vAs: String) =
      df.select(col(id).as(idAs), vecD(col(vec)).as(vAs))
        .withColumn("sig", lshSignature(col(vAs), hp))
        .select(col(idAs), col(vAs),
          explode(array((0 until bands).map(j =>
            struct(lit(j).as("bidx"),
              shiftright(col("sig"), j * width).bitwiseAND(mask).as("bucket"))): _*))
            .as("bb"))
        .select(col(idAs), col(vAs), col("bb.bidx"), col("bb.bucket"))
    val c = banded(corpus, "neighbor_id", "cv")
    val q = broadcast(banded(queries, "query_id", "qv"))
    val cand = c.join(q, Seq("bidx", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("cv")).distinct()
      .withColumn("cos", cosine(col("qv"), col("cv")))
    Kernels.topKPerKeyAgg(
      cand.select(col("query_id"), col("neighbor_id"), col("cos")),
      Seq("query_id"), Seq(col("cos"), -col("neighbor_id")), k)
  }

  /** Probe the vector dimensionality from the first row — a
    * driver-side job; call once and pass the result as `dims` rather
    * than letting every query construction re-probe. */
  def dimsOf(df: DataFrame, vec: String): Int =
    df.select(size(col(vec))).first().getInt(0)
}
