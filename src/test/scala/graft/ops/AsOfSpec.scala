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

  test("a matched right row with a NULL value surfaces the NULL (DuckDB ASOF parity)") {
    // quote at ts 20 has px NULL: an event at 25 matches THAT row and
    // must see NULL, not carry the older 1.0 forward
    val q = Seq(("A", 10L, Some(1.0)), ("A", 20L, None: Option[Double]))
      .toDF("k", "qts", "px")
    val e = Seq(("A", 15L, "before"), ("A", 25L, "after"))
      .toDF("k", "ets", "tag")
    val got = AsOf.join(e, q, Seq("k"), "ets", "qts", Seq("px"))
      .orderBy("ets").select("tag", "px")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("before", Some(1.0)), ("after", None)))
  }

  test("right-side ties at identical (key, ts) resolve deterministically (greatest tuple)") {
    val q = Seq(("A", 10L, 5.0), ("A", 10L, 7.0), ("A", 10L, 6.0))
      .toDF("k", "qts", "px")
    val e = Seq(("A", 11L, "e")).toDF("k", "ets", "tag")
    val runs = (1 to 3).map { _ =>
      AsOf.join(e, q, Seq("k"), "ets", "qts", Seq("px"))
        .select("px").as[Double].head()
    }
    assert(runs.toSet == Set(7.0))
  }

  test("forward direction carries the earliest quote at-or-after each event") {
    val got = AsOf.join(events, quotes, Seq("k"), "ets", "qts", Seq("px"),
        direction = "forward")
      .orderBy("k", "ets")
      .select("tag", "px").as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("e1", Some(1.0)), // before any quote → first upcoming
      ("e2", Some(1.0)), // exactly at quote 10 → visible (>= semantics)
      ("e3", Some(3.0)), // between 20 and 30 → the 30 quote
      ("e4", None),      // after all quotes → null
      ("e5", Some(9.0)), ("e6", None)))
  }

  test("nearest direction picks the closer side; backward wins exact ties and distance 0") {
    val q = Seq(("A", 10L, 1.0), ("A", 20L, 2.0)).toDF("k", "qts", "px")
    val e = Seq(
      ("A", 10L, "at"),      // distance 0 via backward
      ("A", 13L, "closerBw"),// 3 back vs 7 fwd → 1.0
      ("A", 18L, "closerFw"),// 8 back vs 2 fwd → 2.0
      ("A", 15L, "tie"),     // 5 back vs 5 fwd → backward wins → 1.0
      ("A", 99L, "onlyBw"),  // nothing after → backward
      ("A", 1L, "onlyFw")    // nothing before → forward
    ).toDF("k", "ets", "tag")
    val got = AsOf.join(e, q, Seq("k"), "ets", "qts", Seq("px"),
        direction = "nearest")
      .select("tag", "px").as[(String, Option[Double])].collect().toMap
    assert(got == Map("at" -> Some(1.0), "closerBw" -> Some(1.0),
      "closerFw" -> Some(2.0), "tie" -> Some(1.0),
      "onlyBw" -> Some(2.0), "onlyFw" -> Some(1.0)))
  }

  test("carryRightTs surfaces the matched ts — the tolerance hook") {
    val got = AsOf.join(events, quotes, Seq("k"), "ets", "qts", Seq("px"),
        carryRightTs = Some("matched_ts"))
      .orderBy("k", "ets")
      .select("tag", "matched_ts").as[(String, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("e1", None), ("e2", Some(10L)), ("e3", Some(20L)), ("e4", Some(30L)),
      ("e5", None), ("e6", None)))
  }

  test("NULL timestamps never match: null-ts right rows drop, null-ts left rows carry nothing") {
    val q = Seq(("A", Some(6L), 2.0), ("A", None: Option[Long], 9.0))
      .toDF("k", "qts", "px")
    val e = Seq(("A", Some(5L), "real"), ("A", None: Option[Long], "nullts"))
      .toDF("k", "ets", "tag")
    for (d <- Seq("backward", "forward", "nearest")) {
      val got = AsOf.join(e, q, Seq("k"), "ets", "qts", Seq("px"),
          direction = d)
        .select("tag", "px").as[(String, Option[Double])].collect().toMap
      // the null-ts quote (px=9.0) must never be picked — before the
      // filter it sorted nulls-first and became a phantom "oldest"
      // match (and nearest's NULL distance fell through to it)
      assert(got("real") == (d match {
        case "backward" => None
        case _ => Some(2.0)
      }), s"direction=$d got ${got("real")}")
      assert(got("nullts").isEmpty, s"direction=$d matched a null-ts left row")
    }
  }

  test("nearest on fractional timestamps keeps exact distances (no Long truncation)") {
    // ts 10.6: truncation to 10 would call the 10.0 quote (dist 0)
    // closer than the 11.0 quote (dist 1) — true distances are 0.6 vs
    // 0.4, so 11.0 must win
    val q = Seq(("A", 10.0, 1.0), ("A", 11.0, 2.0)).toDF("k", "qts", "px")
    val e = Seq(("A", 10.6, "e")).toDF("k", "ets", "tag")
    val got = AsOf.join(e, q, Seq("k"), "ets", "qts", Seq("px"),
        direction = "nearest")
      .select("px").as[Double].head()
    assert(got == 2.0)
  }

  test("nearest refuses mismatched ts types (days vs µs would mix units)") {
    val q = Seq(("A", java.sql.Date.valueOf("2024-01-01"), 1.0))
      .toDF("k", "qts", "px")
    intercept[IllegalArgumentException] {
      AsOf.join(events, q, Seq("k"), "ets", "qts", Seq("px"),
        direction = "nearest")
    }
  }
}
