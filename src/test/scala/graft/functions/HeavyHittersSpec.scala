package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact-at-capacity: counts equal the true frequencies") {
    val s = new MgSketch(10)
    val stream = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    scala.util.Random.shuffle(stream).foreach(s.insert)
    assert(s.sorted.toSeq == Seq(("a", 50L), ("b", 30L), ("c", 7L)))
  }

  test("beyond capacity: every item above n/(k+1) survives; counts underestimate boundedly") {
    val k = 4
    val s = new MgSketch(k)
    // 1000 of "hot", 100 each of 20 cold items → n = 3000
    val stream = Seq.fill(1000)("hot") ++
      (0 until 20).flatMap(i => Seq.fill(100)(s"cold$i"))
    stream.foreach(s.insert)
    val m = s.sorted.toMap
    assert(m.contains("hot"), "true heavy hitter must survive")
    // count error ≤ n/(k+1)
    assert(m("hot") >= 1000 - 3000 / (k + 1))
    assert(m("hot") <= 1000)
  }

  test("merge in the exact regime equals a single sketch; beyond it keeps the bound") {
    val a = new MgSketch(8); val b = new MgSketch(8)
    Seq.fill(40)("x").foreach(a.insert); Seq.fill(3)("y").foreach(a.insert)
    Seq.fill(25)("x").foreach(b.insert); Seq.fill(9)("z").foreach(b.insert)
    a.merge(b)
    assert(a.sorted.toSeq == Seq(("x", 65L), ("z", 9L), ("y", 3L)))
  }

  test("distributed agg matches exact group counts when distinct <= k") {
    val df = spark.range(0, 3000).repartition(11)
      .select((col("id") % 3).cast("int").as("g"),
        concat(lit("w"), (col("id") % 7).cast("string")).as("tok"))
    val got = df.groupBy($"g")
      .agg(HeavyHittersAgg.heavy_hitters($"tok", 64).as("hh"))
      .select($"g", explode($"hh").as("e"))
      .select($"g", $"e.item", $"e.cnt")
      .as[(Int, String, Long)].collect().toSet
    val exact = df.groupBy($"g", $"tok").count()
      .as[(Int, String, Long)].collect().toSet
    assert(got == exact)
  }
}
