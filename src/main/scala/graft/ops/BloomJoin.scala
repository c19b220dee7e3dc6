package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered joins — the semi-join reduction for the regime
  * where the build side is too large to broadcast as a hash table but
  * its KEY SET fits a few megabytes of bloom bits: filter the 100 TB
  * probe side down to (matches + ε false positives) BEFORE the
  * shuffle, then run the exact join on the survivors. This is the
  * manual, always-on form of Spark's runtime bloom filter
  * (spark.sql.optimizer.runtime.bloomFilter.*), built from the same
  * engine primitives (BloomFilterAggregate / might_contain), so the
  * probe-side scan keeps whole-stage codegen.
  *
  * Exactness is unconditional: the bloom only REDUCES the probe set
  * (no false negatives by construction), and the exact join afterwards
  * removes false positives — so results equal the plain join at every
  * fpp. The bloom binary is bounded (numBits/8 bytes) regardless of
  * build-side row count; collecting it to the driver is the same
  * bounded hop Spark's own runtime-filter subquery performs.
  */
object BloomJoin {

  /** Aggregate the build side's hashed keys into one bloom binary.
    * One pass, partial-aggregated (per-partition blooms OR-merge), a
    * single numBits/8-byte result. */
  def buildBloom(build: DataFrame, key: Column,
                 expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(xxhash64(key)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    build.select(agg.as("bloom")).head.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` probe predicate. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Exact semi join with a bloom prefilter on the probe side: scan
    * survivors ≈ true matches × (1 + fpp), shuffled instead of the
    * full probe table. Null probe keys may pass the bloom (Spark hash
    * functions fold null to the seed) — the exact join drops them, as
    * it does every other false positive.
    *
    * The build side is scanned ONCE: the distinct key set (needed by
    * the exact join anyway) is cached and feeds BOTH the
    * bloom_filter_agg build and the semi-join side — bloom membership
    * over distinct keys is the same set, and the bloom's merge input
    * shrinks from all build rows to the distinct keys. Registered in
    * [[graft.ops.CacheScope]]; release the scope when done. */
  def semiJoin(probe: DataFrame, build: DataFrame,
               probeKey: String, buildKey: String,
               expectedItems: Long = 1000000L,
               numBits: Long = 8388608L): DataFrame = {
    // alias the build key: with probeKey == buildKey (the natural
    // same-named-column call) the raw condition would be ambiguous
    val keys = CacheScope.persist(
      build.select(col(buildKey).as("__bloom_bk")).distinct())
    val bloom = buildBloom(keys, col("__bloom_bk"), expectedItems, numBits)
    probe.filter(mightContain(bloom, col(probeKey)))
      .join(keys, col(probeKey) === col("__bloom_bk"), "left_semi")
  }

  /** Exact inner join, bloom-prefiltered the same way. */
  def innerJoin(probe: DataFrame, build: DataFrame,
                probeKey: String, buildKey: String,
                expectedItems: Long = 1000000L,
                numBits: Long = 8388608L): DataFrame = {
    val bloom = buildBloom(build, col(buildKey), expectedItems, numBits)
    val b = build.withColumn("__bloom_bk", col(buildKey))
    probe.filter(mightContain(bloom, col(probeKey)))
      .join(b, col(probeKey) === col("__bloom_bk"))
      .drop("__bloom_bk")
  }
}
