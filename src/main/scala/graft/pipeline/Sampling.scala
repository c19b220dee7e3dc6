package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}

/** Bounded training-sample extraction shared by the quantizer builders
  * ([[IvfIndex]], [[PqIndex]]). */
private[pipeline] object Sampling {

  /** Per-partition RESERVOIR sample of a single `array<double>` column:
    * ~`maxRows/numPartitions` rows drawn uniformly from EVERY partition
    * (a head-of-partition take would bias toward ingest order when the
    * corpus is sorted/clustered). No count() pre-pass, one scan, and
    * the driver collect stays O(maxRows · dims) at ANY corpus size.
    * Deterministic: fixed partitioning + in-partition scan order +
    * per-partition seeded RNG. */
  def boundedVectorSample(vecOnly: DataFrame, maxRows: Int,
                          seed: Long): Array[Array[Double]] = {
    val parts = math.max(1, vecOnly.rdd.getNumPartitions)
    val perPart = math.max(1, maxRows / parts)
    vecOnly.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        val rnd = new scala.util.Random(seed ^ (idx.toLong * 0x9e3779b97f4a7c15L))
        val res = new Array[Row](perPart)
        var n = 0L
        while (it.hasNext) {
          val row = it.next()
          if (n < perPart) res(n.toInt) = row
          else {
            val j = (rnd.nextDouble() * (n + 1)).toLong
            if (j < perPart) res(j.toInt) = row
          }
          n += 1L
        }
        res.iterator.take(math.min(n, perPart.toLong).toInt)
      }
      .collect().iterator.take(maxRows)
      .map(_.getSeq[Double](0).toArray).toArray
  }
}
