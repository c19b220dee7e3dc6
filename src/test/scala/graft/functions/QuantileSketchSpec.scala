package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact-at-capacity: sketch quantiles equal exact order statistics") {
    val s = new GkSketch(1e-3) // exact for n < 1000
    val vals = (1 to 500).map(i => ((i * 7919) % 500).toDouble)
    vals.foreach(s.insert)
    val sorted = vals.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) {
      val r = math.max(1, math.ceil(q * vals.length).toInt)
      assert(s.query(q) == sorted(r - 1), s"q=$q")
    }
  }

  test("merge of disjoint sketches equals one sketch over the union (exact regime)") {
    val a = new GkSketch(1e-3); val b = new GkSketch(1e-3)
    (1 to 300).foreach(i => a.insert(((i * 31) % 100).toDouble))
    (1 to 300).foreach(i => b.insert(((i * 17) % 90 + 50).toDouble))
    a.merge(b)
    val union = ((1 to 300).map(i => ((i * 31) % 100).toDouble) ++
      (1 to 300).map(i => ((i * 17) % 90 + 50).toDouble)).sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val r = math.max(1, math.ceil(q * union.length).toInt)
      assert(a.query(q) == union(r - 1), s"q=$q")
    }
  }

  test("beyond capacity: state stays bounded and rank error within 2*eps*n") {
    val eps = 0.01
    val s = new GkSketch(eps)
    val n = 50000
    // adversarially ordered stream (descending runs)
    (0 until n).foreach(i => s.insert(((i.toLong * 104729L) % n).toDouble))
    assert(s.tuples.length < 3 * (1 / (2 * eps)) + 16,
      s"state ${s.tuples.length} not bounded")
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val got = s.query(q)
      // values are the permuted 0..n-1 so the value IS its rank-1
      val targetRank = math.ceil(q * n)
      assert(math.abs((got + 1) - targetRank) <= 2 * eps * n + 1,
        s"q=$q got=$got target=$targetRank")
    }
  }

  test("distributed agg over many partitions matches exact percentiles") {
    val df = spark.range(0, 2000).repartition(13)
      .select((col("id") % 997).cast("double").as("v"),
        (col("id") % 3).cast("int").as("g"))
    val got = df.groupBy($"g")
      .agg(QuantileSketchAgg.quantile_sketch($"v", Seq(0.5, 0.9), 1e-4).as("qs"))
      .select($"g", element_at($"qs", 1).as("p50"), element_at($"qs", 2).as("p90"))
      .as[(Int, Double, Double)].collect()
      .map { case (g, a, b) => g -> (a, b) }.toMap
    val exact = df.as[(Double, Int)].collect().groupBy(_._2).map { case (g, rows) =>
      val sorted = rows.map(_._1).sorted
      def rank(q: Double) = sorted(math.max(1, math.ceil(q * sorted.length).toInt) - 1)
      g -> (rank(0.5), rank(0.9))
    }
    assert(got == exact)
  }
}
