package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq[(java.lang.Long, String)](
    (1L, "a"), (2L, "b"), (2L, null), (null, "a"), (4L, "c"))
    .toDF("x", "s")

  test("profile: nulls, distincts, min/max, mean — exact long format") {
    val p = Profile.profile(df, Seq("x", "s"))
      .orderBy("col_name").collect()
    val x = p(1) // col_name sorts: s, x
    assert(x.getString(0) == "x" && x.getLong(1) == 5 && x.getLong(2) == 1)
    assert(x.getLong(3) == 3 && x.getString(4) == "1" && x.getString(5) == "4")
    assert(math.abs(x.getDouble(6) - 2.25) < 1e-12) // (1+2+2+4)/4
    val s = p(0)
    assert(s.getString(0) == "s" && s.getLong(2) == 1 && s.getLong(3) == 3)
    assert(s.getString(4) == "a" && s.getString(5) == "c" && s.isNullAt(6))
  }

  test("profile: approx-distinct mode plans no Expand and stays close") {
    val big = spark.range(0, 10000)
      .select(col("id").as("x"), (col("id") % 97).cast("string").as("s"))
    val p = Profile.profile(big, Seq("x", "s"), exactDistinct = false)
    assert(!p.queryExecution.executedPlan.toString.contains("Expand"),
      "HLL mode must not plan the distinct Expand")
    val m = p.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(m("x") - 10000.0) / 10000.0 < 0.05)
    assert(math.abs(m("s") - 97.0) / 97.0 < 0.05)
  }

  test("histogram: exact bin counts, boundary values land in the upper bin") {
    import spark.implicits._
    val df = Seq(0.0, 5.0, 9.999, 10.0, 15.0, 25.0, 29.9).toDF("x")
    val h = Profile.histogram(df, "x", lo = 0.0, hi = 30.0, bins = 3)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // [0,10): 3 rows; [10,20): 2 (10.0 is a boundary → upper bin); [20,30): 2
    assert(h == Seq((0, 3L), (1, 2L), (2, 2L)))
  }

  test("histogram: out-of-range clamps to edge bins, nulls drop, empty bins absent") {
    import spark.implicits._
    val df = Seq(Some(-5.0), Some(1.0), Some(99.0), None).toDF("x")
    val h = Profile.histogram(df, "x", lo = 0.0, hi = 30.0, bins = 3)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    // -5 clamps into bin 0 (its observed min shows the clamp), 99 into
    // bin 2; bin 1 is empty and absent; the null row never counts
    assert(h == Seq((0, 2L, -5.0, 1.0), (2, 1L, 99.0, 99.0)))
  }

  test("histogram: NaN is excluded like NULL, not smuggled into the top bin") {
    import spark.implicits._
    // Spark orders NaN above every double, so an unguarded
    // greatest/least clamp would route it into the LAST bin and
    // inflate the right tail — it must simply not count
    val df = Seq(1.0, 15.0, Double.NaN, Double.NaN).toDF("x")
    val h = Profile.histogram(df, "x", lo = 0.0, hi = 30.0, bins = 3)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(h == Seq((0, 1L), (1, 1L)), s"got $h")
    // an integral column goes through the same guard unharmed
    val di = Seq(1L, 15L, 25L).toDF("x")
    val hi2 = Profile.histogram(di, "x", lo = 0.0, hi = 30.0, bins = 3)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(hi2 == Seq((0, 1L), (1, 1L), (2, 1L)))
  }

  test("outliers: flags the spike, skips zero-variance groups and nulls") {
    import spark.implicits._
    // group a: 20 values at ~10 plus one spike at 1000 → spike flagged;
    // group b: constant (sd = 0) → no outliers, no divide-by-zero;
    // group c: a null value → ignored, not scored
    val df = ((1 to 20).map(i => ("a", Some(10.0 + (i % 3) * 0.1))) ++
      Seq(("a", Some(1000.0))) ++
      (1 to 5).map(_ => ("b", Some(7.0))) ++
      Seq(("c", Option.empty[Double]), ("c", Some(1.0)), ("c", Some(2.0))))
      .toDF("g", "x")
    val out = Profile.outliers(df, Seq("g"), "x", z = 3.0)
      .select("g", "x").as[(String, Double)].collect().toSeq
    assert(out == Seq(("a", 1000.0)))
  }
}
