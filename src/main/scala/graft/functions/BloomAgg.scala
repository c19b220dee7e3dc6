package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable bloom-filter aggregate over pre-hashed (xxhash64) longs —
  * the building block of [[graft.catalog.Layout.buildBloomIndex]]'s
  * per-file equality-skipping index (the Parquet/Iceberg bloom-filter
  * idea lifted to the table manifest, where it prunes whole FILES off
  * the task list instead of row groups inside an already-opened file).
  *
  * Runs as a typed Aggregator under `udaf`: the buffer is a live
  * in-memory `BloomFilter` (object-hash aggregation — serialization
  * only on partial-merge shuffle), updates are map-side combined, and
  * the result is the filter's portable `writeTo` byte form, readable
  * back with `BloomFilter.readFrom` on any JVM. Hashing the indexed
  * column to a long FIRST (xxhash64, codegen'd) makes the index
  * column-type-agnostic: the probe side hashes its literal the same
  * way and tests membership with `mightContainLong`.
  *
  * All filters built with the same (expectedItems, fpp) are
  * bit-compatible, so partial merges never fail. Sizing is per FILE
  * (the group key), not per table: at 100 TB with ~1–10 M rows per
  * file, 1 M expected @ 1% fpp costs ~1.2 MB per file — manifest-scale
  * metadata, far below the data it lets a point probe skip. */
class BloomAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, hashed: Long): BloomFilter = {
    b.putLong(hashed); b
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {

  /** Aggregate the pre-hashed long column `c` into a serialized bloom
    * filter (one per group). */
  def bloom_agg(c: Column, expectedItems: Long, fpp: Double): Column =
    udaf(new BloomAgg(expectedItems, fpp), Encoders.scalaLong).apply(c)

  /** Probe a serialized filter for a pre-hashed value. */
  def mightContain(serialized: Array[Byte], hashed: Long): Boolean =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(serialized))
      .mightContainLong(hashed)
}
