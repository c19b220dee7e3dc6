package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("bloom semi join equals the plain semi join") {
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
    val got = BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().toSet
    val exp = li.join(urgent, $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().toSet
    assert(got == exp && got.nonEmpty)
  }

  test("a tiny bloom (heavy false positives) still gives exact results") {
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
    // 64 bits for thousands of keys — nearly everything passes the
    // bloom; the exact join must still remove every false positive
    val got = BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 8, numBits = 64)
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().toSet
    val exp = li.join(urgent, $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().toSet
    assert(got == exp)
  }

  test("bloom inner join equals the plain inner join") {
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .select($"s_suppkey", $"s_name")
    val got = BloomJoin.innerJoin(li.select($"l_suppkey", $"l_orderkey",
        $"l_linenumber"), sup, "l_suppkey", "s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"s_name")
      .collect().map(_.toSeq).toSet
    val exp = li.select($"l_suppkey", $"l_orderkey", $"l_linenumber")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"s_name")
      .collect().map(_.toSeq).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("the probe scan is filtered by might_contain before the join") {
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
    val df = BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"))
    // the filter sits probe-side, under the join's streamed input —
    // the whole point is shrinking rows BEFORE the shuffle/join
    val joinIdx = p.indexOf("Join")
    val mcIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx > joinIdx,
      "might_contain must appear below the join in the plan tree")
  }
}
