package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val path = System.getProperty("java.io.tmpdir") + "/graft_zm_spec"

  private def written() = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val df = spark.range(0, 10000)
      .select($"id", ($"id" % 100).as("v"), ($"id" * 7 % 1000).as("z"))
    ZoneMap.writeRangeClustered(df, path, "z", numFiles = 10)
    df
  }

  test("manifest has one tight zone per file; zones are near-disjoint") {
    written()
    val m = ZoneMap.manifest(spark, path, "z")
      .select($"zmin", $"zmax").as[(Long, Long)].collect().sortBy(_._1)
    assert(m.length == 10)
    // range clustering ⟹ consecutive files don't interleave ranges
    m.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(aMax <= bMin, s"overlapping zones: $aMax > $bMin")
    }
  }

  test("readRange scans only overlapping files and returns exact rows") {
    val df = written()
    val pruned = ZoneMap.readRange(spark, path, "z", lit(100L), lit(199L))
    val exp = df.filter($"z" >= 100 && $"z" <= 199)
      .select($"id").as[Long].collect().toSet
    assert(pruned.select($"id").as[Long].collect().toSet == exp)
    // ~1/10 of the value space → a 10-file layout must skip most files
    assert(pruned.inputFiles.length <= 3,
      s"expected ≤3 files scanned, got ${pruned.inputFiles.length}")
  }

  test("a range overlapping nothing reads nothing") {
    written()
    val pruned = ZoneMap.readRange(spark, path, "z", lit(5000L), lit(6000L))
    assert(pruned.count() == 0)
    assert(pruned.inputFiles.isEmpty)
  }
}
