package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline keeps exactly the non-dominated rows") {
    // (size, price): frontier is (3,30) and (5,50); (4,60) is beaten
    // by (5,50) [bigger, cheaper]; (3,40) by (3,30) [same, cheaper];
    // (2,35) by (3,30) [bigger, cheaper]
    val df = Seq(("a", 3, 30.0), ("b", 3, 40.0), ("c", 5, 50.0),
      ("d", 4, 60.0), ("e", 2, 35.0)).toDF("id", "sz", "pr")
    val got = Skyline.skyline2d(df, "sz", "pr")
      .select("id").as[String].collect().toSet
    assert(got == Set("a", "c"))
  }

  test("ties on both axes are mutually non-dominating and all kept") {
    val df = Seq(("a", 3, 30.0), ("b", 3, 30.0), ("c", 1, 50.0))
      .toDF("id", "sz", "pr")
    val got = Skyline.skyline2d(df, "sz", "pr")
      .select("id").as[String].collect().toSet
    assert(got == Set("a", "b"))
  }

  test("a single best-on-both-axes row dominates everything else") {
    val df = Seq(("a", 9, 1.0), ("b", 3, 2.0), ("c", 8, 5.0))
      .toDF("id", "sz", "pr")
    val got = Skyline.skyline2d(df, "sz", "pr")
      .select("id").as[String].collect().toSeq
    assert(got == Seq("a"))
  }
}
