package graft.ops

import graft.SparkSpec

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  test("finds pairs across cell boundaries, excludes beyond-radius, no dups") {
    // radius 1: cells are unit squares. (0.9,0.9)–(1.1,1.1) straddle
    // a cell corner at distance ~0.283; (5,5) is isolated
    val pts = Seq((1L, 0.9, 0.9), (2L, 1.1, 1.1), (3L, 5.0, 5.0))
      .toDF("id", "x", "y")
    val got = SpatialJoin.distanceJoin(pts, "id", "x", "y", 1.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 0.282843)), got.toString)
  }

  test("pair at exactly the radius is included; each pair once") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 3.0, 4.0), (3L, 0.0, 5.0))
      .toDF("id", "x", "y")
    // d(1,2)=5, d(1,3)=5, d(2,3)=sqrt(9+1)=3.162...
    val got = SpatialJoin.distanceJoin(pts, "id", "x", "y", 5.0)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 5.0), (1L, 3L, 5.0), (2L, 3L, 3.162278)),
      got.toString)
  }

  test("matches brute force on a pseudo-random cloud") {
    val pts = (1L to 200L).map { i =>
      (i, (i * 37 % 101).toDouble / 4, (i * 53 % 97).toDouble / 4)
    }
    val df = pts.toDF("id", "x", "y")
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 4.0
    } yield (a._1, b._1)).toSet
    val got = SpatialJoin.distanceJoin(df, "id", "x", "y", 2.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == brute, s"got ${got.size} vs brute ${brute.size}")
  }
}
