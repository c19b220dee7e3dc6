package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — frequent item pairs and
  * association confidence over a (basket, item) fact. The reference
  * stores the raw material (each stocklist is a basket of symbols,
  * `lists.js:24-37`; each portfolio a basket of holdings) but never
  * asks "which items co-occur"; an analytics engine replacing it
  * should answer the canonical version of that question.
  *
  * Shape (a-priori, Agrawal–Srikant 1994, by published form): the
  * item-frequency pass prunes BEFORE the pair join — an item pair can
  * only reach `minPairSupport` if both members individually do, so
  * infrequent items (the long tail, most of the catalog at 100 TB)
  * never enter the self-join. The pair candidate space is then
  * Σ_baskets k² over FREQUENT items only, further bounded by
  * `maxBasketSize` (a degenerate mega-basket — one crawler account
  * touching every item — would otherwise contribute a quadratic blob;
  * capping is the standard guard and is part of the contract, not a
  * sampling shortcut). The self-join shuffles on the basket key; both
  * sides are the same frame, so the exchange is planned once and
  * reused. Counts are map-side combined hash aggs throughout.
  */
object Baskets {

  /** Frequent co-occurring item pairs with confidence.
    *
    * @param facts          (basket, item) fact rows; duplicates of an
    *                       item within a basket are collapsed first
    * @param basketCol      basket key column
    * @param itemCol        item key column
    * @param minItemSupport an item must appear in ≥ this many baskets
    *                       to enter pair generation (a-priori prune)
    * @param minPairSupport a pair must co-occur in ≥ this many baskets
    * @param maxBasketSize  baskets with more distinct items than this
    *                       are excluded entirely (fanout guard)
    * @return (p1, p2, pair_sup, conf) with p1 < p2, one row per
    *         surviving pair; conf = pair_sup / support(p1)
    */
  def frequentPairs(facts: DataFrame, basketCol: String, itemCol: String,
                    minItemSupport: Long, minPairSupport: Long,
                    maxBasketSize: Int = 1 << 10): DataFrame = {
    val items = facts
      .select(col(basketCol).as("ok"), col(itemCol).as("pk"))
      .distinct()
    val sized = items.groupBy(col("ok"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasketSize)
      .select(col("ok"))
    val base = items.join(sized, Seq("ok"), "left_semi")
    // item supports over capped baskets — the prune AND the
    // confidence denominator, computed once
    val freq = base.groupBy(col("pk"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minItemSupport)
    val fb = base.join(freq.select(col("pk")), Seq("pk"), "left_semi")
    val pairs = fb.as("a")
      .join(fb.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("pair_sup"))
      .filter(col("pair_sup") >= minPairSupport)
    pairs
      .join(freq.withColumnRenamed("pk", "p1"), Seq("p1"))
      .select(col("p1"), col("p2"), col("pair_sup"),
        round(col("pair_sup").cast("double") / col("sup"), 6).as("conf"))
  }
}
