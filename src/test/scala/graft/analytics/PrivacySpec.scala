package graft.analytics

import graft.SparkSpec

/** Pins the privacy-audit kernels: k-anonymity suppression removes
  * exactly the small classes, and ℓ-diversity catches the homogeneity
  * attack k-anonymity misses (a large class with one sensitive
  * value). */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI = (zip): class "A" has 5 rows but ONE sensitive value
  // (homogeneous — k-anonymous at k=5, yet 1-diverse); class "B" has
  // 2 rows with 2 values (diverse but small); class "C" has 4 rows,
  // 3 distinct values plus a NULL
  private lazy val df = (
    (1 to 5).map(i => ("A", i.toLong, Some("flu"))) ++
      Seq(("B", 10L, Some("ok")), ("B", 11L, Some("flu"))) ++
      Seq(("C", 20L, Some("x")), ("C", 21L, Some("y")),
        ("C", 22L, Some("z")), ("C", 23L, Option.empty[String]))
    ).toDF("zip", "id", "diag")

  test("kAnonymityViolations flags only classes below k; suppression drops exactly them") {
    val v = Privacy.kAnonymityViolations(df, Seq("zip"), k = 4)
      .select("zip").as[String].collect().toSet
    assert(v == Set("B"))
    val kept = Privacy.suppressSmallGroups(df, Seq("zip"), k = 4)
      .select("zip").as[String].collect()
    assert(kept.length == 9 && !kept.contains("B"))
  }

  test("lDiversityViolations catches the homogeneous class k-anonymity passes") {
    val v = Privacy.lDiversityViolations(df, Seq("zip"), "diag", l = 2)
      .select("zip", "n", "diversity")
      .as[(String, Long, Long)].collect().toSet
    // A: 5 rows, 1 distinct diag → violates ℓ=2 despite being the
    // biggest class; B and C are ≥2-diverse (C's NULL contributes
    // nothing — 3 distinct non-null values)
    assert(v == Set(("A", 5L, 1L)))
    // at ℓ=4, C (3 distinct + NULL) violates too
    val v4 = Privacy.lDiversityViolations(df, Seq("zip"), "diag", l = 4)
      .select("zip").as[String].collect().toSet
    assert(v4 == Set("A", "B", "C"))
  }
}
