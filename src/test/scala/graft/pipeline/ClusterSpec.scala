package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  // 3 tight planted blobs in 4-D, well separated
  private def blobs = {
    val centers = Seq(
      Array(10.0, 0.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 0.0))
    val rnd = new scala.util.Random(7)
    (0 until 300).map { i =>
      val c = centers(i % 3)
      (i.toLong, i % 3, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }.toDF("id", "truth", "embedding")
  }

  test("fit recovers planted clusters; assignment is pure") {
    val df = blobs
    val cents = Cluster.fit(df, "embedding", k = 3, distIters = 3)
    val got = Cluster.assign(df, "embedding", cents)
      .groupBy($"truth").agg(countDistinct($"cluster").as("nc"),
        count(lit(1)).as("n")).collect()
    // every planted blob maps to exactly one learned cluster
    assert(got.forall(r => r.getLong(1) == 1L && r.getLong(2) == 100L))
    // and the three blobs land in three DISTINCT clusters
    val m = Cluster.assign(df, "embedding", cents)
      .select($"truth", $"cluster").distinct().collect()
    assert(m.map(_.getLong(1)).distinct.length == 3)
  }

  test("distributed Lloyd's rounds never increase the SSE objective") {
    val df = blobs.cache()
    val sses = (0 to 3).map { it =>
      Cluster.sse(df, "embedding",
        Cluster.fit(df, "embedding", k = 3, distIters = it))
    }
    sses.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9) }
    df.unpersist()
  }

  test("semanticDupPairs finds planted copies within clusters only") {
    val df = blobs
    val copies = df.filter($"id" < 30)
      .withColumn("id", $"id" + 1000L)
    val un = df.unionByName(copies)
    val cents = Cluster.fit(df, "embedding", k = 3, distIters = 2)
    val pairs = Cluster.semanticDupPairs(un, "id", "embedding", cents,
        minCosine = 0.9999)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    // every planted copy pair recovered (identical vectors share an
    // argmin assignment, so the cluster restriction cannot lose them)
    assert((0L until 30L).map(i => (i, i + 1000L)).toSet.subsetOf(pairs))
    // and nothing pairs across different planted blobs (orthogonal-ish
    // directions: cosine far below threshold)
    val truthOf = (id: Long) => (id % 1000) % 3
    assert(pairs.forall { case (a, b) => truthOf(a) == truthOf(b) })
    graft.ops.CacheScope.releaseAll()
  }

  test("assignment ties break to the lowest centroid index") {
    val df = Seq((0L, Seq(1.0f, 0.0f))).toDF("id", "embedding")
    val same = Array(Array(0.0, 0.0), Array(0.0, 0.0))
    val c = Cluster.assign(df, "embedding", same)
      .select($"cluster").as[Long].head()
    assert(c == 0L)
  }
}
