package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus construction — the composition the
  * individual pipeline operators exist for, as ONE declarative plan
  * Catalyst optimizes as a whole (filters reach the scan, the dedup
  * agg sees only pre-projected fingerprints, nothing materializes
  * between stages):
  *
  *   1. quality floor   — drop docs under `minTokens`
  *   2. exact dedup     — min-id survivor per content fingerprint
  *   3. split           — deterministic salted-md5 train/val/test
  *   4. sequence packing — token-budget packs per split, in id order
  *
  * Each stage is individually driver-gated (t1/t2, d1, t7, t6); the
  * composed flow is gated end-to-end (t14) against a chained-CTE
  * oracle — the real guarantee a corpus build needs is that the
  * STAGES COMPOSE without re-shuffling or recomputing. */
object Corpus {

  def buildTrainingSet(docs: DataFrame, id: String, text: String,
                       minTokens: Int, salt: String,
                       fracs: Seq[(String, Double)],
                       packBudget: Long,
                       shardSpan: Long = 100000L): DataFrame = {
    val withTok = docs
      .withColumn("n_tok",
        TextAnalysis.nTokensWs(TextAnalysis.normalize(col(text))).cast("long"))
      .filter(col("n_tok") >= minTokens)
    val deduped = Dedup.exact(withTok, id, text)
    val split = TextAnalysis.hashSplit(deduped, id, salt, fracs)
    // pack per split IN ONE PASS: the split column joins the packing
    // windows' partition keys (Spark has no cross-branch common-
    // subplan elimination, so a union of per-split branches would
    // re-run the scan + dedup once per split)
    TextAnalysis.packSequences(
        split.select(col(id), col("split"), col("n_tok")),
        id, "n_tok", packBudget, shardSpan, extraKeys = Seq("split"))
      .select(col(id), col("split"), col("n_tok"),
        col("offset"), col("pack_id"))
  }
}
