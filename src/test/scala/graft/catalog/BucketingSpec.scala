package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY §4): both sides bucketed on the
  * join key → the sort-merge join runs with ZERO exchanges. At 100 TB
  * this is the difference between shuffling the fact table on every
  * join and never shuffling it. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no Exchange") {
    // tables land in the default spark-warehouse; clean slate first
    // (a previously aborted run may have left orphan locations)
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        org.apache.hadoop.fs.FileUtil.fullyDelete(loc)
      }
    }
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("o_bucketed")

    // force the sort-merge path (at test scale Catalyst would rightly
    // broadcast instead — which also bypasses bucketing)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), "l_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      assert(joined.count() ==
        li.join(o, li("l_orderkey") === o("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }

    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
  }
}
