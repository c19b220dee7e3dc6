package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("k", "qts", "px")

  private def events = Seq(
    ("A", 5L, "e1"),   // before any quote → null
    ("A", 10L, "e2"),  // exactly at quote 10 → 1.0 (<= semantics)
    ("A", 25L, "e3"),  // between 20 and 30 → 2.0
    ("A", 99L, "e4"),  // after all → 3.0
    ("B", 14L, "e5"),  // before B's only quote → null
    ("C", 50L, "e6")   // key with no quotes at all → null
  ).toDF("k", "ets", "tag")

  test("as-of join carries the latest quote at-or-before each event") {
    val got = AsOf.join(events, quotes, Seq("k"), "ets", "qts", Seq("px"))
      .orderBy("k", "ets")
      .select("tag", "px").as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("e1", None), ("e2", Some(1.0)), ("e3", Some(2.0)), ("e4", Some(3.0)),
      ("e5", None), ("e6", None)))
  }

  test("every left row survives exactly once") {
    val got = AsOf.join(events, quotes, Seq("k"), "ets", "qts", Seq("px"))
    assert(got.count() == 6)
    assert(got.columns.toSeq == Seq("k", "ets", "tag", "px"))
  }
}
