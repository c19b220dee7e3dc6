package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-anonymity operators (Sweeney, "k-Anonymity: a model for
  * protecting privacy", 2002) — the governance pass a training-data
  * pipeline runs before releasing a derived dataset: a row is
  * k-anonymous w.r.t. a quasi-identifier tuple (the columns an
  * adversary can link externally) when at least k rows share its QI
  * values. Both operators are single hash aggregations + a semi/anti
  * join — shuffle on the QI key only, no driver state, same shape at
  * any scale.
  */
object Privacy {

  /** The violating equivalence classes: QI tuples shared by FEWER
    * than `k` rows, with their sizes — the audit report. */
  def kAnonymityViolations(df: DataFrame, qi: Seq[String], k: Int): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)

  /** Suppression enforcement: drop every row whose QI class is
    * smaller than `k` — the released frame is k-anonymous by
    * construction (suppression, the bluntest generalization; a real
    * release pipeline would coarsen QI columns first to keep more
    * rows). Anti-join against the violating classes. */
  def suppressSmallGroups(df: DataFrame, qi: Seq[String], k: Int): DataFrame =
    df.join(kAnonymityViolations(df, qi, k).select(qi.map(col): _*),
      qi, "left_anti")
}
