package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval — fusing a lexical ranking (BM25 over the stored
  * term index, [[TextAnalysis.searchBm25]]) with a vector ranking
  * (cosine ANN, [[Similarity]]/[[IvfIndex]]) by RECIPROCAL RANK
  * FUSION (Cormack/Clarke/Buettcher, SIGIR'09): each list contributes
  * `1/(k0 + rank)` per id, summed across lists. Rank-based fusion
  * needs no score calibration between BM25's unbounded sums and
  * cosine's [−1, 1] — the standard first fusion every hybrid search
  * deployment reaches for.
  *
  * Scale shape: the inputs are already top-k lists (k rows per query,
  * never corpus-sized), so the fusion is a unioned aggregation over
  * O(lists · k) rows — negligible next to the retrievals themselves,
  * and embarrassingly parallel across queries when the lists carry a
  * query key in `id`.
  */
object Hybrid {

  /** Fuse ranked lists: each input holds (`id`, `rank`) with rank
    * 1-based; output one row per id seen in ANY list with its RRF
    * `score` (sum of 1/(k0+rank)) and `n_lists` (how many lists
    * surfaced it — the agreement signal). Deterministic: ties in
    * downstream ordering should break on id. */
  def rrf(lists: Seq[DataFrame], id: String, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    lists.map(_.select(col(id), col("rank")))
      .reduce(_.unionByName(_))
      .groupBy(col(id))
      .agg(sum(lit(1.0) / (lit(k0) + col("rank"))).as("score"),
        count(lit(1)).as("n_lists"))
  }
}
