package graft.functions

import graft.SparkSpec
import graft.ops.Kernels
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerKeyAgg equals the window topKPerKey on a total order") {
    // deterministic pseudo-random rows, unique (v, id) total order
    val df = spark.range(0, 5000).select(
      (col("id") % 7).as("g"),
      (xxhash64(col("id")) % 1000).as("v"),
      col("id"))
    val ord = Seq(col("v"), col("id"))
    val viaAgg = Kernels.topKPerKeyAgg(df, Seq("g"), ord, 5)
      .orderBy("g", "v", "id").collect().toSeq
    val viaWin = Kernels.topKPerKey(df, Seq("g"), ord, 5)
      .orderBy("g", "v", "id").collect().toSeq
    assert(viaAgg == viaWin)
    assert(viaAgg.size == 35)
  }

  test("plan: bounded-heap top-k is a partial ObjectHashAggregate, no window sort") {
    val df = spark.range(0, 1000).select(
      (col("id") % 3).as("g"), col("id").as("v"))
    val plan = Kernels.topKPerKeyAgg(df, Seq("g"), Seq(col("v")), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
    assert(!plan.contains("Window"), "must not fall back to a window sort")
    // partial mode present → map-side combine before the shuffle
    assert(plan.contains("partial_topk_rows"), plan.take(1200))
  }

  test("groups smaller than k, null ord keys skipped, ties at the boundary") {
    val df = Seq[(Long, java.lang.Long, String)](
      (1L, 3L, "a"), (1L, null, "skipme"), (2L, 1L, "b"), (2L, 2L, "c"),
      (2L, 3L, "d"), (2L, 4L, "e")).toDF("g", "v", "s")
    val got = Kernels.topKPerKeyAgg(df, Seq("g"), Seq(col("v")), 3)
      .as[(Long, Option[Long], String)].collect().toSet
    assert(got == Set((1L, Some(3L), "a"), (2L, Some(4L), "e"),
      (2L, Some(3L), "d"), (2L, Some(2L), "c")), got.toString)
  }
}
