package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join: salting for hot keys (the manual complement to
  * AQE's skew-join splitting, which only fires on sort-merge joins
  * past size thresholds — salting also covers aggregations and
  * bounded-memory cases AQE can't re-plan).
  *
  * Left side (large, skewed): each row gets a deterministic salt in
  * [0, buckets). Right side (smaller): replicated once per salt
  * value. The join key becomes (key, salt) — a hot key's rows spread
  * over `buckets` reducers instead of one.
  */
object Skew {

  /** Salted inner equi-join on `keys`. `buckets` multiplies the right
    * side's row count — keep it ≤ ~32 and the right side the smaller
    * input. Salt is derived from a hash of the left row's whole
    * content (deterministic, no rand()). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** Salted two-phase aggregation: partial agg on (key, salt), final
    * agg on key. For algebraic aggregates (sum/count/min/max) this
    * bounds any single reducer's input at |hot key| / buckets.
    *
    * @param partials aggregate columns for phase 1, by output name
    * @param finals   phase-2 aggregate over the phase-1 outputs
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partials: Map[String, Column],
                finals: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
  }
}
