package graft.analytics

import graft.SparkSpec

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1:{a,b}, 2:{a,b}, 3:{a,b,c}, 4:{a,c}, 5:{c} (+ dup row)
  private def facts = Seq(
    (1L, "a"), (1L, "b"),
    (2L, "a"), (2L, "b"), (2L, "b"), // dup (2,b) must collapse
    (3L, "a"), (3L, "b"), (3L, "c"),
    (4L, "a"), (4L, "c"),
    (5L, "c")
  ).toDF("ok", "pk")

  test("frequentPairs counts co-occurrence with confidence over supports") {
    val got = Baskets
      .frequentPairs(facts, "ok", "pk", minItemSupport = 2, minPairSupport = 2)
      .orderBy("p1", "p2")
      .as[(String, String, Long, Double)].collect().toSeq
    // sup: a=4, b=3, c=3; pairs: (a,b)=3 conf 3/4, (a,c)=2 conf 2/4,
    // (b,c)=1 → below minPairSupport
    assert(got == Seq(("a", "b", 3L, 0.75), ("a", "c", 2L, 0.5)), got.toString)
  }

  test("a-priori prune: an infrequent item never enters pair generation") {
    val got = Baskets
      .frequentPairs(facts, "ok", "pk", minItemSupport = 4, minPairSupport = 1)
      .collect()
    // only 'a' reaches support 4 — no partner survives, so no pairs,
    // even though (a,b) co-occurs 3 times
    assert(got.isEmpty, got.mkString(","))
  }

  test("maxBasketSize excludes oversized baskets from counts entirely") {
    val got = Baskets
      .frequentPairs(facts, "ok", "pk", minItemSupport = 1,
        minPairSupport = 1, maxBasketSize = 2)
      .orderBy("p1", "p2")
      .as[(String, String, Long, Double)].collect().toSeq
    // basket 3 (size 3) is dropped: sup a=3, b=2, c=2 (capped world);
    // pairs (a,b)=2 conf 2/3, (a,c)=1 conf 1/3
    assert(got == Seq(("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333)),
      got.toString)
  }
}
