package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Int, Long, Long, String)*) =
    rows.toDF("k", "ts", "ord", "attr")

  test("no-op changes collapse; intervals chain with NULL-open current row") {
    val h = Scd.historize(
      log((1, 10L, 1L, "a"), (1, 20L, 2L, "a"), (1, 30L, 3L, "b"),
          (1, 40L, 4L, "b"), (1, 50L, 5L, "a")),
      Seq("k"), "ts", "ord", Seq("attr"))
      .orderBy("valid_from")
      .select($"attr", $"valid_from", $"valid_to", $"is_current")
      .as[(String, Long, Option[Long], Boolean)].collect().toSeq
    assert(h == Seq(
      ("a", 10L, Some(30L), false),
      ("b", 30L, Some(50L), false),
      ("a", 50L, None, true)))
  }

  test("same-timestamp ties break by ord deterministically") {
    val h = Scd.historize(
      log((1, 10L, 2L, "b"), (1, 10L, 1L, "a")),
      Seq("k"), "ts", "ord", Seq("attr"))
      .orderBy($"is_current", $"attr")
      .select($"attr", $"is_current").as[(String, Boolean)].collect().toSeq
    assert(h == Seq(("a", false), ("b", true)))
  }

  test("merge of a batch equals historize over the full changelog") {
    val before = Seq((1, 10L, 1L, "a"), (1, 30L, 3L, "b"),
      (2, 10L, 2L, "x"), (3, 5L, 9L, "q"))
    val batch = Seq((1, 50L, 7L, "c"),   // append to key 1
      (2, 20L, 8L, "x"),                 // no-op change for key 2
      (2, 40L, 9L, "y"),
      (4, 1L, 4L, "new"))                // brand-new key
    val full = Scd.historize(log((before ++ batch): _*),
      Seq("k"), "ts", "ord", Seq("attr"))
    val inc = Scd.merge(
      Scd.historize(log(before: _*), Seq("k"), "ts", "ord", Seq("attr")),
      log(batch: _*), Seq("k"), "ts", "ord", Seq("attr"))
    val fullSet = full.collect().map(_.toSeq).toSet
    val incSet = inc.collect().map(_.toSeq).toSet
    assert(incSet == fullSet)
    // key 3 untouched by the batch — and present
    assert(incSet.exists(_.head == 3))
  }

  test("merge keeps same-instant version order deterministic (A->B at one ts)") {
    // history holds a zero-length [10,10) 'a' and [10,null) 'b' — the
    // reconstruction ord must preserve a-before-b regardless of
    // physical row order, or the merged history flips values
    val before = Seq((1, 10L, 1L, "a"), (1, 10L, 2L, "b"))
    val h = Scd.historize(log(before: _*), Seq("k"), "ts", "ord", Seq("attr"))
    val merged = Scd.merge(h, log((1, 20L, 3L, "c")),
        Seq("k"), "ts", "ord", Seq("attr"))
      .orderBy($"valid_from", $"valid_to".asc_nulls_last)
      .select($"attr", $"valid_from", $"valid_to")
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(merged == Seq(("a", 10L, Some(10L)), ("b", 10L, Some(20L)),
      ("c", 20L, None)))
  }

  test("late batch rows splice consistently against the retained history") {
    val before = Seq((1, 10L, 1L, "a"), (1, 40L, 4L, "b"))
    val late = Seq((1, 20L, 2L, "z"))
    val inc = Scd.merge(
      Scd.historize(log(before: _*), Seq("k"), "ts", "ord", Seq("attr")),
      log(late: _*), Seq("k"), "ts", "ord", Seq("attr"))
      .orderBy("valid_from")
      .select($"attr", $"valid_from", $"valid_to")
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(inc == Seq(("a", 10L, Some(20L)), ("z", 20L, Some(40L)),
      ("b", 40L, None)))
  }

  test("asOf returns exactly the version covering the instant") {
    val h = Scd.historize(
      log((1, 10L, 1L, "a"), (1, 30L, 2L, "b"), (2, 5L, 3L, "x")),
      Seq("k"), "ts", "ord", Seq("attr"))
    val at20 = Scd.asOf(h, lit(20L)).select($"k", $"attr")
      .as[(Int, String)].collect().toSet
    assert(at20 == Set((1, "a"), (2, "x")))
    val at30 = Scd.asOf(h, lit(30L)).select($"k", $"attr")
      .as[(Int, String)].collect().toSet
    assert(at30 == Set((1, "b"), (2, "x")))
  }
}
