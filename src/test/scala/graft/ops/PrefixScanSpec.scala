package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  test("distributed cumsum equals the single-window cumsum on any order") {
    val df = spark.range(0, 5000).repartition(17)
      .select(col("id"), (col("id") * 37 % 101).as("w"),
        ((col("id") * 7919) % 5000).as("q"))
    val got = PrefixScan.exclusiveCumSum(df,
        Seq(col("q").desc, col("id").asc), col("w"), partitions = 11)
      .select($"id", $"__prefix", $"__rank")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val rows = df.select($"id", $"w", $"q").as[(Long, Long, Long)]
      .collect().sortBy { case (id, _, q) => (-q, id) }
    var acc = 0L
    val exp = rows.zipWithIndex.map { case ((id, w, _), i) =>
      val r = (id, acc, (i + 1).toLong); acc += w; r
    }.sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
  }

  test("takeUnderBudget keeps exactly the rows whose exclusive prefix is under budget") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("id", "tok")
    // budget 25: rows 1,2 fit fully; row 3 straddles (prefix 20 < 25);
    // row 4 (prefix 30) is out
    val got = PrefixScan.takeUnderBudget(df, Seq(col("id").asc),
        col("tok"), budget = 25L)
      .select($"id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("the bases branch reuses the range shuffle — one exchange, not two") {
    val df = spark.range(0, 5000).select(col("id"), (col("id") % 7).as("w"))
    val out = PrefixScan.exclusiveCumSum(df, Seq(col("id").asc), col("w"),
      partitions = 8)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    // AQE must dedupe the two consumers of the range repartition; a
    // second full exchange would double the corpus shuffle at scale
    assert(p.contains("ReusedQueryStage") || p.contains("ReusedExchange"), p.take(800))
  }

  test("result is identical across different partition counts") {
    val df = spark.range(0, 2000)
      .select(col("id"), (col("id") % 13 + 1).as("w"))
    val a = PrefixScan.exclusiveCumSum(df, Seq(col("id").desc), col("w"),
        partitions = 3)
      .select($"id", $"__prefix").as[(Long, Long)].collect().toSet
    val b = PrefixScan.exclusiveCumSum(df, Seq(col("id").desc), col("w"),
        partitions = 29)
      .select($"id", $"__prefix").as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
