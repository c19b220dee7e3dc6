package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KernelsSpec extends SparkSpec {
  import spark.implicits._

  private def bars = Seq(
    ("AAA", "2024-01-01", 10.0),
    ("AAA", "2024-01-02", 11.0),
    ("AAA", "2024-01-03", 12.0),
    ("BBB", "2024-01-01", 20.0),
    ("BBB", "2024-01-02", 19.0)
  ).toDF("symbol", "day", "close")

  test("latestPerKey keeps exactly the max-ordered row per key") {
    val got = Kernels.latestPerKey(bars, Seq("symbol"), Seq(col("day")))
      .orderBy("symbol").collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("AAA", "2024-01-03", 12.0), ("BBB", "2024-01-02", 19.0)))
  }

  test("topKPerKey returns k most recent per key") {
    val got = Kernels.topKPerKey(bars, Seq("symbol"), Seq(col("day")), 2)
    assert(got.count() == 4)
    assert(got.filter($"symbol" === "AAA").agg(min($"day")).head.getString(0) == "2024-01-02")
  }

  test("upsert: source wins on conflict, non-conflicting target rows kept") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val src = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val got = Kernels.upsert(target, src, Seq("k")).orderBy("k")
      .as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a"), (2, "B"), (3, "C")))
  }

  test("insertIfAbsent: existing target rows win") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val src = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val got = Kernels.insertIfAbsent(target, src, Seq("k")).orderBy("k")
      .as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a"), (2, "b"), (3, "C")))
  }

  test("upsert/insertIfAbsent with NON-PREFIX keys keep column alignment") {
    // regression: USING joins move key columns first; a positional
    // union then scrambles rows (caught via review's (listid, userid)
    // key, columns 2-3 of the table)
    val target = Seq((100L, 1L, 2L, "old")).toDF("id", "k1", "k2", "v")
    val src = Seq((200L, 1L, 2L, "new"), (201L, 3L, 4L, "add"))
      .toDF("id", "k1", "k2", "v")
    val up = Kernels.upsert(target, src, Seq("k1", "k2")).orderBy("id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(up == Seq((200L, 1L, 2L, "new"), (201L, 3L, 4L, "add")))
    val ins = Kernels.insertIfAbsent(target, src, Seq("k1", "k2")).orderBy("id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(ins == Seq((100L, 1L, 2L, "old"), (201L, 3L, 4L, "add")))
  }

  test("upsert is idempotent") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val src = Seq((2, "B")).toDF("k", "v")
    val once = Kernels.upsert(target, src, Seq("k"))
    val twice = Kernels.upsert(once, src, Seq("k"))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("cowUpdate only touches predicate-matched rows") {
    val got = Kernels.cowUpdate(bars, $"symbol" === "AAA" && $"day" === "2024-01-02",
        Map("close" -> lit(99.9)))
      .filter($"close" === 99.9).collect()
    assert(got.length == 1 && got.head.getString(1) == "2024-01-02")
  }

  test("cowDelete removes exactly the doomed keys") {
    val doomed = Seq(("AAA", "2024-01-01")).toDF("symbol", "day")
    val got = Kernels.cowDelete(bars, doomed, Seq("symbol", "day"))
    assert(got.count() == 4)
    assert(got.filter($"symbol" === "AAA" && $"day" === "2024-01-01").isEmpty)
  }

  test("dedupExactKeys keeps deterministic minimum per key") {
    val dup = Seq((1, "x", 5), (1, "y", 3), (2, "z", 7)).toDF("k", "v", "ord")
    val got = Kernels.dedupExactKeys(dup, Seq("k"), col("ord")).orderBy("k")
      .as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((1, "y", 3), (2, "z", 7)))
  }

  test("normalizeEdge + neighborsOf cover both directions") {
    val raw = Seq((5, 2), (3, 9), (7, 3)).toDF("a", "b")
    val edges = Kernels.normalizeEdge(raw, "a", "b")
    assert(edges.filter($"u1" <= $"u2").count() == 3)
    val got = Kernels.neighborsOf(edges, "u1", "u2", lit(3))
      .orderBy("neighbor").as[Int].collect().toSeq
    assert(got == Seq(7, 9))
  }

  test("mutualNeighborCounts: pair counts on a known graph; hub cap drops only hub paths") {
    // star around hub 1 (1-2, 1-3, 1-4) plus edge 2-3: mutuals via
    // hub 1 for all leaf pairs, plus {2,3} see each other AND share 1
    val edges = Kernels.normalizeEdge(
      Seq((1, 2), (1, 3), (1, 4), (2, 3)).toDF("a", "b"), "a", "b")
    val got = Kernels.mutualNeighborCounts(edges, "u1", "u2")
      .orderBy("x", "y").as[(Int, Int, Long)].collect().toSeq
    assert(got == Seq(
      (1, 2, 1L), // share 3
      (1, 3, 1L), // share 2
      (2, 3, 1L), // share 1
      (2, 4, 1L), (3, 4, 1L))) // share 1
    // cap degree at 2: hub 1 (deg 3) no longer mediates pairs, but
    // still appears as an endpoint via its leaves
    val capped = Kernels.mutualNeighborCounts(edges, "u1", "u2",
        maxDegree = Some(2))
      .orderBy("x", "y").as[(Int, Int, Long)].collect().toSeq
    assert(capped == Seq((1, 2, 1L), (1, 3, 1L)))
  }

  test("merge3 routes all five clause paths, null keys never match") {
    val tgt = Seq[(java.lang.Long, String, Double)](
      (1L, "keep", 1.0),    // no source match → unchanged
      (2L, "upd", 2.0),     // matched, update condition true → source row
      (3L, "del", 9.0),     // matched, delete condition true → gone
      (4L, "skip", 4.0),    // matched, neither condition → unchanged
      (null, "tnull", 0.0)  // null key → never matches, survives
    ).toDF("k", "v", "x")
    val src = Seq[(java.lang.Long, String, Double)](
      (2L, "updated", 2.5),
      (3L, "doomed", 9.9),
      (4L, "blocked", 4.4),
      (5L, "inserted", 5.0),
      (6L, "filtered", 6.0),  // insert condition false → not inserted
      (null, "snull", 7.0)    // null key → NOT MATCHED path
    ).toDF("k", "v", "x")
    val got = Kernels.merge3(tgt, src, Seq("k"),
        deleteWhen = Some(col("s.v") === "doomed"),
        updateWhen = Some(col("s.x") < 3.0),
        insertWhen = Some(col("s.v") =!= "filtered"))
      .as[(Option[Long], String, Double)].collect().toSet
    assert(got == Set(
      (Some(1L), "keep", 1.0), (Some(2L), "updated", 2.5),
      (Some(4L), "skip", 4.0), (Some(5L), "inserted", 5.0),
      (None, "tnull", 0.0), (None, "snull", 7.0)), got.toString)
  }

  test("merge3 defaults degenerate to upsert semantics") {
    val tgt = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val src = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    val got = Kernels.merge3(tgt, src, Seq("k"))
      .as[(Long, String)].collect().toSet
    val ups = Kernels.upsert(tgt, src, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got == ups && got == Set((1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("existsFlags: missing grants coalesce to false") {
    val rows = Seq(1, 2, 3).toDF("k")
    val grants = Seq((1, 10), (1, 20), (2, 10)).toDF("k", "uid")
    val got = Kernels.existsFlags(rows, grants, Seq("k"),
        Map("has_any" -> max(lit(true)), "has_20" -> max($"uid" === 20)))
      .orderBy("k").as[(Int, Boolean, Boolean)].collect().toSeq
    assert(got == Seq((1, true, true), (2, true, false), (3, false, false)))
  }
}
