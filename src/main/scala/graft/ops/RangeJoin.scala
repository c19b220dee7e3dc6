package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Binned range join — the batch point-in-interval join, completing
  * the inequality-join family next to [[AsOf]] (nearest-predecessor)
  * and [[graft.streaming.Streams.quotedTrades]] (the watermarked
  * stream form).
  */
object RangeJoin {

  /** floor(x / w) in PURE INTEGER arithmetic: `x − pmod(x, w)` is
    * exactly divisible by `w` and non-increasing, so the integral
    * division IS the floor (correct for negative epochs, where
    * truncating division would shift bins) — exact at any long-range
    * epoch scale, unlike a double `floor(x / w)`, which rounds the
    * quotient once |x| crosses 2⁵³ (microsecond epochs ×
    * high-precision units get there) and then bins a boundary value
    * one cell off on one side only, silently dropping matches. */
  private def floorDiv(c: Column, w: Long): Column = {
    val x = c.cast("long")
    val exact = x - pmod(x, lit(w))
    ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(exact), ColumnBridge.expression(lit(w))))
  }

  /** Join each point row to every interval row whose `[lo, hi]`
    * contains it (inclusive both ends). `ts`, `lo`, `hi` must be
    * integral (epoch units of the caller's choosing).
    *
    * A raw `p.ts BETWEEN i.lo AND i.hi` predicate has no equality, so
    * Spark plans a broadcast-nested-loop / cartesian — O(|P|·|I|)
    * compared pairs, the classic range-join scale cliff. Discretizing
    * time into `binWidth`-sized bins restores an equi-key: a point
    * falls in exactly ONE bin, an interval is exploded to the bins it
    * spans (`sequence`), the join becomes a plain shuffle hash join
    * on the bin id, and the exact BETWEEN re-filter runs only on
    * bin-colocated pairs. A (point, interval) pair can only meet in
    * the point's single bin, so the output needs no dedup pass.
    *
    * Pick `binWidth` near the TYPICAL interval length: explode cost is
    * |I|·(len/binWidth + 1) rows and candidate cost is the per-bin
    * point×interval product — narrower bins trade explode rows for
    * tighter candidates. A degenerate giant interval explodes to
    * len/binWidth rows; cap interval lengths upstream or raise the
    * width. Bin ids come from [[floorDiv]] — integer floor division,
    * exact at any epoch scale. */
  def pointInInterval(points: DataFrame, ts: String,
                      intervals: DataFrame, lo: String, hi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth >= 1, "pointInInterval: binWidth must be >= 1")
    val p = points.withColumn("__bin", floorDiv(col(ts), binWidth))
    // an inverted interval (lo > hi) matches nothing by definition —
    // drop it BEFORE sequence(), which would otherwise count DOWN and
    // explode spurious candidate bins
    val i = intervals.filter(col(lo) <= col(hi)).withColumn("__bin",
      explode(sequence(floorDiv(col(lo), binWidth),
        floorDiv(col(hi), binWidth))))
    p.join(i, Seq("__bin"))
      .filter(col(ts) >= col(lo) && col(ts) <= col(hi))
      .drop("__bin")
  }

  /** INTERVAL × INTERVAL overlap join — the symmetric generalization
    * of [[pointInInterval]]: emit every (left, right) pair whose
    * closed intervals `[llo, lhi]` and `[rlo, rhi]` overlap
    * (`llo <= rhi AND rlo <= lhi`), optionally restricted to pairs
    * sharing `partitionKeys` (the usual per-entity form — downtime
    * windows per site, sessions per user — which is also what keeps
    * the output size sane).
    *
    * Same bin discretization as the point form, on BOTH sides: each
    * interval explodes to the bins it spans, candidates meet on
    * (partitionKeys, bin), the exact overlap predicate re-filters.
    * Two overlapping intervals co-occupy every bin their
    * intersection touches, so pairs would duplicate once per shared
    * bin; instead of a distinct pass (a second shuffle over the whole
    * output), each pair is emitted ONLY in its canonical bin — the
    * first bin of the intersection, `max(floor(llo/w), floor(rlo/w))`
    * — which both sides provably occupy. Exactly-once, no dedup
    * shuffle. Cost: explode is Σ len/w + 1 per side, candidates are
    * the per-(key,bin) product — the bin width trades one against
    * the other exactly as in the point form. */
  def intervalOverlap(left: DataFrame, llo: String, lhi: String,
                      right: DataFrame, rlo: String, rhi: String,
                      binWidth: Long,
                      partitionKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth >= 1, "intervalOverlap: binWidth must be >= 1")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo) <= col(hi)).withColumn("__bin",
        explode(sequence(floorDiv(col(lo), binWidth),
          floorDiv(col(hi), binWidth))))
    val l = binned(left, llo, lhi)
    val r = binned(right, rlo, rhi)
    l.join(r, partitionKeys :+ "__bin")
      .filter(col(llo) <= col(rhi) && col(rlo) <= col(lhi) &&
        // canonical-bin guard: emit once, where the intersection starts
        col("__bin") === greatest(floorDiv(col(llo), binWidth),
          floorDiv(col(rlo), binWidth)))
      .drop("__bin")
  }
}
