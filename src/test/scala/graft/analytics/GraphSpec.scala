package graft.analytics

import graft.SparkSpec

/** Hand-checked PageRank on the 3-node path graph 1–2–2–3. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path = Seq((1L, 2L), (2L, 3L)).toDF("u1", "u2")

  test("pageRank: one iteration on a path graph matches hand arithmetic") {
    // deg: 1→1, 2→2, 3→1; pr0 = 1/3 each
    // pr1(1) = 0.15/3 + 0.85·(pr0(2)/2) = 0.05 + 0.85/6
    // pr1(2) = 0.15/3 + 0.85·(pr0(1) + pr0(3)) = 0.05 + 0.85·2/3
    val got = Graph.pageRank(path, "u1", "u2", iters = 1)
      .orderBy("node").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(math.abs(got(0)._2 - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(got(1)._2 - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(math.abs(got(2)._2 - got(0)._2) < 1e-12) // symmetry
  }

  test("pageRank: mass conserved (Σpr = 1) and symmetric after 3 rounds") {
    val got = Graph.pageRank(path, "u1", "u2", iters = 3)
      .orderBy("node").as[(Long, Double)].collect().toSeq
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-9)
    assert(math.abs(got(0)._2 - got(2)._2) < 1e-12)
    assert(got(1)._2 > got(0)._2) // the hub outranks the leaves
  }
}
