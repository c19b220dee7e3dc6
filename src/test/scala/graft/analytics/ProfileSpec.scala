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
}
