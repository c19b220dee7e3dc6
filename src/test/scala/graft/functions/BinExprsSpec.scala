package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinExprsSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_bin matches the filter-count contract, incl. duplicates") {
    val bounds = Array(1.0, 3.0, 3.0, 7.0, 10.0)
    val vals = Seq(-5.0, 1.0, 2.0, 3.0, 5.0, 7.0, 9.9, 10.0, 11.0)
    val got = vals.toDF("v")
      .select(BinExprs.sorted_bin($"v", bounds).as("b"))
      .as[Long].collect().toSeq
    val want = vals.map(v => bounds.count(_ <= v).toLong)
    assert(got == want)
    // driver-side kernel agrees with the column path
    vals.foreach { v =>
      assert(SortedBinIndex.countLe(bounds, v) == bounds.count(_ <= v))
    }
  }

  test("sorted_bin is null-safe and codegen-evaluable in a projection") {
    val bounds = (1 to 255).map(_.toDouble).toArray
    val df = spark.range(0, 1000)
      .select(when($"id" % 7 === 0, lit(null)).otherwise($"id").as("v"))
      .select(BinExprs.sorted_bin($"v", bounds).as("b"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 143)
    assert(rows.filter(!_.isNullAt(0)).map(_.getLong(0)).max == 255L)
  }
}
