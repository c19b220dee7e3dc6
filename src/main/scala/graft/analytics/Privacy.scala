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

  /** L-DIVERSITY audit (Machanavajjhala et al., "ℓ-diversity: privacy
    * beyond k-anonymity", ICDE 2006) — the attack k-anonymity leaves
    * open: a QI class can be large yet have every member share the
    * SAME sensitive value, so linkage still discloses it (the
    * homogeneity attack). A class is (distinct-)ℓ-diverse when its
    * rows carry at least ℓ distinct sensitive values; this returns
    * the violating classes with their size and diversity — the
    * report a release gate blocks on, the complement of
    * [[kAnonymityViolations]]'s size-only audit.
    *
    * One hash aggregation over the QI key (the distinct count adds
    * the usual Expand, still one shuffle on QI); NULL sensitive
    * values count as zero diversity contributors (count distinct
    * ignores NULL — a class of all-NULL sensitives reports
    * diversity 0, which IS disclosure of absence). */
  def lDiversityViolations(df: DataFrame, qi: Seq[String],
                           sensitive: String, l: Int): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("diversity"))
      .filter(col("diversity") < l)
}
