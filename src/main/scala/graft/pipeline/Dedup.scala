package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Kernels

/** Deduplication operators for training-data pipelines, ordered by
  * cost/recall: exact → n-gram Jaccard (inverted index) → MinHash+LSH
  * (Broder, "On the resemblance and containment of documents", 1997;
  * banding analysis per Leskovec/Rajaraman/Ullman, Mining of Massive
  * Datasets ch.3) → SimHash (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002; dedup application
  * per Manku/Jain/Sarma, WWW 2007). All are shuffle-on-key designs
  * that scale horizontally; none collects to the driver.
  */
object Dedup {

  /** Exact dedup on normalized content. Groups by the md5 fingerprint
    * (16 bytes shuffled per doc, not the document body) and keeps the
    * smallest id deterministically. */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    Kernels.dedupExactKeys(
      Kernels.ensureParallelism(df)
        .withColumn("__fp", TextAnalysis.fingerprintMd5(col(text))),
      Seq("__fp"), col(id)).drop("__fp")

  /** Distinct word n-gram shingles, one row per (id, shingle). */
  def shingles(df0: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val df = Kernels.ensureParallelism(df0)
    val toks = TextAnalysis.tokensWs(TextAnalysis.normalize(col(text)))
    // guard: sequence(1, 0) would produce a DESCENDING [1, 0] range
    val idxs = when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    df.select(col(id), explode(array_distinct(
        transform(idxs, i => array_join(slice(toks, i, lit(n)), " ")))).as("shingle"))
  }

  /** Exact n-gram Jaccard similarity for all pairs above `minJaccard`,
    * via an inverted index on shingles: |A∩B| from a self-join on the
    * shingle, |A|,|B| from per-doc counts.
    *
    * Scale controls: `maxDf` drops shingles occurring in more than
    * that many docs (stopword-shingle suppression — a hot shingle
    * would otherwise quadratically explode the join); the self-join
    * shuffles on the shingle hash, candidate pairs on (id1, id2).
    */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String,
                        n: Int = 3, minJaccard: Double = 0.2,
                        maxDf: Option[Int] = None): DataFrame = {
    // join on the 8-byte shingle hash, not the shingle string: the
    // inverted-index self-join shuffles fixed-width longs (collision
    // probability ~ |shingles|²/2⁶⁴ — negligible)
    val sh = {
      val s = shingles(df, id, text, n)
        .select(col(id), xxhash64(col("shingle")).as("shingle"))
      maxDf match {
        case Some(cap) =>
          val hot = s.groupBy("shingle").agg(count(lit(1)).as("df"))
            .filter(col("df") > cap).select("shingle")
          s.join(broadcast(hot), Seq("shingle"), "left_anti")
        case None => s
      }
    }.persist() // read 3× below (doc counts + both join sides)
    val counts = sh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(id).as("id1"), col("shingle"))
    val b = sh.select(col(id).as("id2"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("ix"))
    inter
      .join(counts.select(col(id).as("id1"), col("n_sh").as("n1")), Seq("id1"))
      .join(counts.select(col(id).as("id2"), col("n_sh").as("n2")), Seq("id2"))
      .withColumn("jaccard",
        col("ix").cast("double") / (col("n1") + col("n2") - col("ix")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** MinHash signature per doc: k independent permutations simulated
    * by k seeded xxhash64 draws; signature component i =
    * min over shingles of xxhash64(i, shingle). One hash-agg pass
    * (partial-combine: k running minimums per doc — no sort, no
    * signature matrix materialized wider than k columns). */
  def minHashSignatures(df: DataFrame, id: String, text: String,
                        n: Int = 3, k: Int = 32): DataFrame = {
    // hash each shingle string ONCE, then derive the k draws from the
    // 8-byte value — k× cheaper than hashing the string k times
    val sh = shingles(df, id, text, n)
      .select(col(id), xxhash64(col("shingle")).as("h"))
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("h"))).as(s"mh_$i"))
    sh.groupBy(col(id)).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * k/bands rows each; docs sharing any band bucket become candidate
    * pairs; pairs are scored by signature agreement (estimated
    * Jaccard) and optionally exact-verified by the caller.
    *
    * Collision math: P(candidate) = 1 - (1 - j^r)^b for r rows/band,
    * b bands — with k=32, b=16, r=2 a j=0.25 pair surfaces w.p. ~0.65,
    * j=0.5 w.p. ~0.99. The bucket join shuffles on (band, bucket-hash)
    * — never all-pairs.
    */
  def minHashLshPairs(df: DataFrame, id: String, text: String,
                      n: Int = 3, k: Int = 32, bands: Int = 16,
                      minEstJaccard: Double = 0.2): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // signature agg is the expensive pass; it feeds both the banding
    // explode and the per-side signature rejoin
    val sigs = minHashSignatures(df, id, text, n, k).persist()
    val sigArr = array((0 until k).map(i => col(s"mh_$i")): _*)
    val withBands = sigs.withColumn("sig", sigArr)
      .select(col(id), col("sig"),
        explode(array((0 until bands).map(bnd =>
          struct(lit(bnd).as("band"),
            xxhash64(lit(bnd), concat_ws("_",
              (0 until r).map(j => col(s"mh_${bnd * r + j}")): _*)).as("bucket"))): _*))
          .as("bb"))
      .select(col(id), col("sig"), col("bb.band"), col("bb.bucket"))
    // dedup candidate pairs on ids only, then rejoin the signatures
    val l = withBands.select(col(id).as("id1"), col("band"), col("bucket"))
    val rr = withBands.select(col(id).as("id2"), col("band"), col("bucket"))
    val cand = l.join(rr, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val sigOnly = sigs.withColumn("sig", sigArr).select(col(id), col("sig"))
    cand
      .join(sigOnly.select(col(id).as("id1"), col("sig").as("sig1")), Seq("id1"))
      .join(sigOnly.select(col(id).as("id2"), col("sig").as("sig2")), Seq("id2"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y),
          (b: Column) => b)).cast("double") / k)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id1"), col("id2"), col("est_jaccard"))
  }

  /** Cross-corpus overlap (train/test contamination detection): pairs
    * (a, b) with n-gram Jaccard ≥ `minJaccard` where a ∈ corpusA and
    * b ∈ corpusB — the same inverted-index join as
    * [[ngramJaccardPairs]] but across two corpora (no self-join, no
    * triangle filter). The standard benchmark-decontamination primitive. */
  def crossCorpusOverlap(corpusA: DataFrame, corpusB: DataFrame,
                         id: String, text: String,
                         n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    def sh(df: DataFrame) = shingles(df, id, text, n)
      .select(col(id), xxhash64(col("shingle")).as("shingle"))
    val sa = sh(corpusA).persist()
    val sb = sh(corpusB).persist()
    val ca = sa.groupBy(col(id)).agg(count(lit(1)).as("na"))
    val cb = sb.groupBy(col(id)).agg(count(lit(1)).as("nb"))
    sa.select(col(id).as("id_a"), col("shingle"))
      .join(sb.select(col(id).as("id_b"), col("shingle")), Seq("shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("ix"))
      .join(ca.select(col(id).as("id_a"), col("na")), Seq("id_a"))
      .join(cb.select(col(id).as("id_b"), col("nb")), Seq("id_b"))
      .withColumn("jaccard",
        col("ix").cast("double") / (col("na") + col("nb") - col("ix")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Apply a near-dup pair set: drop every doc that has a
    * smaller-id near-duplicate partner (the standard greedy keep-first
    * policy training pipelines use — each dup CLUSTER keeps exactly
    * its minimum id when the pair relation covers the cluster, which
    * high-threshold LSH pairs do in practice; exact transitive
    * closure would need iterative connected components). */
  def removeNearDuplicates(df: DataFrame, pairs: DataFrame, id: String): DataFrame =
    df.join(pairs.select(col("id2").as(id)).distinct(), Seq(id), "left_anti")

  /** 64-bit SimHash per doc: each token hashes to 64 bits; bit i of
    * the signature is the sign of Σ_tokens (±1 by token bit i).
    * Computed as 64 conditional sums in one hash aggregation. */
  def simHash64(df0: DataFrame, id: String, text: String): DataFrame = {
    val df = Kernels.ensureParallelism(df0)
    // weight by occurrence count over DISTINCT tokens per doc: with a
    // natural-language vocabulary the distinct set is ~10-20× smaller
    // than the token stream, so the 64 conditional sums run on far
    // fewer rows (sum of ±1 per occurrence ≡ ±count per distinct)
    val toks = df.select(col(id),
      explode(TextAnalysis.tokensWs(TextAnalysis.normalize(col(text)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .groupBy(col(id), col("h")).agg(count(lit(1)).as("cnt"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$i"))
    val agg = toks.groupBy(col(id)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
        when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(id), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64-bit signature into
    * `bands` chunks; docs sharing any chunk value are candidates
    * (pigeonhole: any pair with hamming < bands must share a chunk);
    * verify with exact popcount of XOR ≤ maxHamming. */
  def simHashPairs(sigs0: DataFrame, id: String,
                   bands: Int = 8, maxHamming: Int = 7): DataFrame = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    // both join sides derive from the signatures — compute them once
    val sigs = sigs0.persist()
    val chunks = sigs.select(col(id), col("simhash"),
      explode(array((0 until bands).map(j =>
        struct(lit(j).as("cidx"),
          shiftright(col("simhash"), j * width).bitwiseAND(mask).as("chunk"))): _*))
        .as("cc"))
      .select(col(id), col("simhash"), col("cc.cidx"), col("cc.chunk"))
    val l = chunks.select(col(id).as("id1"), col("simhash").as("s1"),
      col("cidx"), col("chunk"))
    val r = chunks.select(col(id).as("id2"), col("simhash").as("s2"),
      col("cidx"), col("chunk"))
    l.join(r, Seq("cidx", "chunk"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("s1"), col("s2")).distinct()
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
