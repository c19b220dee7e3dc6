package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitMixSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is stable under corpus growth and exhaustive") {
    val small = spark.range(0, 1000).toDF("id")
    val big = spark.range(0, 10000).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = TextAnalysis.hashSplit(small, "id", "s1", fr)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val b = TextAnalysis.hashSplit(big, "id", "s1", fr)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    // every id present, and ids 0..999 keep their assignment in the
    // 10x corpus — the property randomSplit does not have
    assert(a.keySet == (0L until 1000L).toSet)
    a.foreach { case (id, sp) => assert(b(id) == sp) }
    // fractions roughly respected at n=10000
    val frac = b.values.groupBy(identity).view.mapValues(_.size / 10000.0)
    assert(math.abs(frac("train") - 0.8) < 0.03)
    assert(math.abs(frac("val") - 0.1) < 0.02)
    assert(math.abs(frac("test") - 0.1) < 0.02)
  }

  test("stratifiedSample: exact quotas, deterministic selection, salt re-rolls") {
    // 3 strata of sizes 100 / 40 / 10 — over-, at-, and under-quota
    val docs = spark.range(0, 150).toDF("id")
      .withColumn("src", when($"id" < 100, "a")
        .when($"id" < 140, "b").otherwise("c"))
    val got = TextAnalysis.stratifiedSample(docs, "src", "id", "s1", quota = 40)
      .select($"src", $"id").as[(String, Long)].collect()
    val bySrc = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // quota binds exactly where the stratum exceeds it, passes through
    // whole strata at or under it
    assert(bySrc("a").size == 40)
    assert(bySrc("b") == (100L until 140L).toSet)
    assert(bySrc("c") == (140L until 150L).toSet)
    // same salt → identical selection; different salt → different cut
    val again = TextAnalysis.stratifiedSample(docs, "src", "id", "s1", 40)
      .select($"id").as[Long].collect().toSet
    assert(again == got.map(_._2).toSet)
    val rerolled = TextAnalysis.stratifiedSample(docs, "src", "id", "s2", 40)
      .filter($"src" === "a").select($"id").as[Long].collect().toSet
    assert(rerolled != bySrc("a"))
  }

  test("different salts re-roll assignments") {
    val df = spark.range(0, 2000).toDF("id")
    val fr = Seq("a" -> 0.5, "b" -> 0.5)
    val s1 = TextAnalysis.hashSplit(df, "id", "salt1", fr)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val s2 = TextAnalysis.hashSplit(df, "id", "salt2", fr)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val changed = s1.count { case (id, sp) => s2(id) != sp }
    assert(changed > 500, s"only $changed of 2000 moved")
  }

  test("mixSources keeps whole weight-1 sources, drops unlisted ones, subsamples the rest") {
    val df = spark.range(0, 4000)
      .select($"id", concat(lit("s"), ($"id" % 4).cast("string")).as("src"))
    val mixed = TextAnalysis.mixSources(df, "id", "src", "m1",
      Seq("s0" -> 1.0, "s1" -> 0.5, "s2" -> 0.0))
    val counts = mixed.groupBy($"src").count()
      .as[(String, Long)].collect().toMap
    assert(counts("s0") == 1000)              // weight 1: everything
    assert(!counts.contains("s2"))            // weight 0: nothing
    assert(!counts.contains("s3"))            // unlisted: nothing
    assert(math.abs(counts("s1") - 500) < 80) // ~half
    // determinism: same call, same rows
    val again = TextAnalysis.mixSources(df, "id", "src", "m1",
      Seq("s0" -> 1.0, "s1" -> 0.5, "s2" -> 0.0))
      .select($"id").as[Long].collect().toSet
    assert(again == mixed.select($"id").as[Long].collect().toSet)
  }

  test("repetitionCounts: exact bigram dup counts, zero for short docs") {
    val df = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab -> 5, distinct 2, dup 3
      (2L, "all distinct words here"), // 3 bigrams, 0 dup
      (3L, "single"),             // 0 bigrams
      (4L, "")                    // 0 bigrams
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        TextAnalysis.repetitionCounts($"text").as("rc"))
      .select($"doc_id", $"rc.n_bigrams", $"rc.n_dup_bigrams")
      .as[(Long, Int, Int)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    assert(got(1L) == (5, 3))
    assert(got(2L) == (3, 0))
    assert(got(3L) == (0, 0))
    assert(got(4L) == (0, 0))
  }
}
