package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the query result cache: identical (plan, table-state) pairs
  * hit, any input commit re-keys, zero-row results round-trip via the
  * schema sidecar, vacuum reclaims. */
class ResultCacheSpec extends SparkSpec {

  private val root = System.getProperty("java.io.tmpdir") +
    "/graft_rcspec_" + java.util.UUID.randomUUID().toString.take(8)
  private val tableP = root + "/t"
  private val cacheP = root + "/cache"

  private def scanPaths(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten.toSet

  test("hit serves the persisted entry; an input append re-keys and recomputes") {
    import spark.implicits._
    Seq(("a", 1L), ("a", 2L), ("b", 4L)).toDF("k", "v")
      .write.mode("overwrite").parquet(tableP)
    def q = spark.read.parquet(tableP).groupBy("k")
      .agg(sum("v").as("s")).orderBy("k")
    val m0 = ResultCache.misses.get()
    val r1 = ResultCache.through(q, cacheP)
    assert(ResultCache.misses.get() == m0 + 1)
    assert(r1.collect().map(x => (x.getString(0), x.getLong(1))).sorted
      .toSeq == Seq(("a", 3L), ("b", 4L)))
    // second identical call: no new miss, scans only the cache entry
    val r2 = ResultCache.through(q, cacheP)
    assert(ResultCache.misses.get() == m0 + 1, "expected a cache hit")
    assert(scanPaths(r2).forall(_.contains("/cache")), scanPaths(r2))
    // a DIFFERENT query misses (plan in the key)
    ResultCache.through(
      spark.read.parquet(tableP).groupBy("k").agg(count(lit(1)).as("n")),
      cacheP)
    assert(ResultCache.misses.get() == m0 + 2)
    // an input append changes the fingerprint → re-key → fresh result
    Seq(("b", 8L)).toDF("k", "v").write.mode("append").parquet(tableP)
    val r3 = ResultCache.through(q, cacheP)
    assert(ResultCache.misses.get() == m0 + 3,
      "a moved input must never hit the stale entry")
    assert(r3.collect().map(x => (x.getString(0), x.getLong(1))).sorted
      .toSeq == Seq(("a", 3L), ("b", 12L)))
  }

  test("zero-row results round-trip through the schema sidecar") {
    import spark.implicits._
    val t2 = root + "/t2"
    Seq(("a", 1L)).toDF("k", "v").write.mode("overwrite").parquet(t2)
    def q = spark.read.parquet(t2).filter(col("v") > 100L)
      .groupBy("k").agg(sum("v").as("s"))
    val r1 = ResultCache.through(q, cacheP)
    assert(r1.isEmpty && r1.schema.fieldNames.toSeq == Seq("k", "s"))
    val m = ResultCache.misses.get()
    val r2 = ResultCache.through(q, cacheP) // hit, schema from sidecar
    assert(ResultCache.misses.get() == m)
    assert(r2.isEmpty && r2.schema.fieldNames.toSeq == Seq("k", "s"))
  }

  test("vacuum reclaims aged entries; the next call recomputes") {
    import spark.implicits._
    val t3 = root + "/t3"
    Seq(("x", 1L)).toDF("k", "v").write.mode("overwrite").parquet(t3)
    def q = spark.read.parquet(t3).agg(sum("v").as("s"))
    ResultCache.through(q, cacheP)
    assert(ResultCache.vacuum(spark, cacheP, olderThanMs = -1000) > 0)
    val m = ResultCache.misses.get()
    ResultCache.through(q, cacheP)
    assert(ResultCache.misses.get() == m + 1, "vacuumed entry must recompute")
  }
}
