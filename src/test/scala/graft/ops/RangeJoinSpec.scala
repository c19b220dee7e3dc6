package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive theta join on every bin geometry") {
    val points = (0L to 200L).map(t => (t, s"p$t")).toDF("ts", "pid")
    // intervals of assorted lengths/alignments, including bin-exact
    // edges, sub-bin slivers, multi-bin spans, and an inverted one
    val intervals = Seq(
      (1L, 10L, 40L), (2L, 15L, 15L), (3L, 29L, 31L), (4L, 0L, 200L),
      (5L, 60L, 89L), (6L, 90L, 90L), (7L, 199L, 250L), (8L, 50L, 49L))
      .toDF("iid", "lo", "hi")
    val naive = points.crossJoin(intervals)
      .filter($"ts" >= $"lo" && $"ts" <= $"hi")
      .select($"pid", $"iid").as[(String, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 30L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "ts", intervals,
          "lo", "hi", binWidth = w)
        .select($"pid", $"iid").as[(String, Long)].collect().toSet
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("negative epochs bin correctly (floor, not truncation)") {
    val points = (-50L to 50L).map(t => (t, t)).toDF("ts", "pid")
    val intervals = Seq((1L, -30L, -10L), (2L, -5L, 5L)).toDF("iid", "lo", "hi")
    val naive = points.crossJoin(intervals)
      .filter($"ts" >= $"lo" && $"ts" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val got = RangeJoin.pointInInterval(points, "ts", intervals,
        "lo", "hi", binWidth = 7)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("output multiplicity: one row per (point, interval) containment") {
    // nested intervals: a point inside both matches twice, never more
    val points = Seq((5L, "x")).toDF("ts", "pid")
    val intervals = Seq((1L, 0L, 10L), (2L, 4L, 6L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "ts", intervals,
      "lo", "hi", binWidth = 3)
    assert(got.count() == 2)
  }

  test("interval overlap equals the naive theta join, exactly once, on every bin geometry") {
    // assorted alignments: nested, identical, touching-at-one-point,
    // disjoint, multi-bin spans, inverted (dropped), negative epochs
    val left = Seq(
      (1L, 0L, 10L), (2L, 5L, 5L), (3L, 29L, 31L), (4L, -20L, -10L),
      (5L, 0L, 100L), (6L, 40L, 39L))
      .toDF("lid", "llo", "lhi")
    val right = Seq(
      (1L, 10L, 20L), (2L, 5L, 5L), (3L, 0L, 200L), (4L, -15L, -12L),
      (5L, 32L, 35L), (6L, 90L, 90L))
      .toDF("rid", "rlo", "rhi")
    val naive = left.filter($"llo" <= $"lhi")
      .crossJoin(right.filter($"rlo" <= $"rhi"))
      .filter($"llo" <= $"rhi" && $"rlo" <= $"lhi")
      .select($"lid", $"rid").as[(Long, Long)].collect()
      .sorted.toSeq
    for (w <- Seq(1L, 7L, 13L, 1000L)) {
      // collect a LIST, not a set: duplicates from a broken
      // canonical-bin guard must fail, not collapse away
      val got = RangeJoin.intervalOverlap(left, "llo", "lhi",
          right, "rlo", "rhi", binWidth = w)
        .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("epoch-scale exactness: binning past 2^53 matches the naive join, exactly once") {
    // beyond 2^53 a double can no longer represent every long, so a
    // double-division bin id rounds the quotient; the integral
    // floorDiv binning must stay exact — pin both join forms against
    // the naive theta join at 2^60-scale epochs (nanosecond-era
    // timestamps × high-precision units get there)
    val base = 1L << 60
    val points = (0L to 400L).map(o => (base + o, o)).toDF("ts", "pid")
    val intervals = Seq(
      (1L, base + 10L, base + 40L), (2L, base + 99L, base + 101L),
      (3L, base - 50L, base + 350L), (4L, base + 200L, base + 200L))
      .toDF("iid", "lo", "hi")
    val naiveP = points.crossJoin(intervals)
      .filter($"ts" >= $"lo" && $"ts" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(97L, 100L, 1024L)) {
      val got = RangeJoin.pointInInterval(points, "ts", intervals,
          "lo", "hi", binWidth = w)
        .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naiveP, s"pointInInterval binWidth=$w")
    }
    val left = intervals.toDF("lid", "llo", "lhi")
    val right = Seq(
      (1L, base + 35L, base + 120L), (2L, base + 150L, base + 199L),
      (3L, base + 200L, base + 205L)).toDF("rid", "rlo", "rhi")
    val naiveI = left.crossJoin(right)
      .filter($"llo" <= $"rhi" && $"rlo" <= $"lhi")
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(97L, 100L, 1024L)) {
      val got = RangeJoin.intervalOverlap(left, "llo", "lhi",
          right, "rlo", "rhi", binWidth = w)
        .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naiveI, s"intervalOverlap binWidth=$w")
    }
  }

  test("interval overlap with a partition key only pairs within the key") {
    val left = Seq(("a", 1L, 0L, 10L), ("b", 2L, 0L, 10L))
      .toDF("k", "lid", "llo", "lhi")
    val right = Seq(("a", 1L, 5L, 15L), ("b", 2L, 50L, 60L))
      .toDF("k", "rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(left, "llo", "lhi",
        right, "rlo", "rhi", binWidth = 7, partitionKeys = Seq("k"))
      .select($"k", $"lid", $"rid").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 1L)))
  }
}
