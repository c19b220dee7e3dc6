package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitmapAggSpec extends SparkSpec {
  import spark.implicits._
  import BitmapAgg.{bitmap_agg, bitmap_and_card, bitmap_card}

  test("bitmap_card equals count(distinct) across chunk boundaries") {
    // ids straddle chunk 0 / chunk 1 (65536) and include dups,
    // a negative id, and a far-sparse id (own chunk, trimmed words)
    val ids = Seq(0L, 1L, 63L, 64L, 65535L, 65536L, 65537L, 65536L,
      -1L, 7L, 7L, 1L << 40)
    val got = ids.toDF("id").repartition(4)
      .agg(bitmap_card(bitmap_agg(col("id"))).as("n"))
      .as[Long].head()
    assert(got == ids.distinct.size.toLong)
  }

  test("aggregate bitmaps are byte-identical regardless of merge order") {
    val ids = (0L until 1000L).map(i => i * 37 % 70000)
    val one = ids.toDF("id").coalesce(1)
      .agg(bitmap_agg(col("id")).as("bm")).as[Array[Byte]].head()
    val many = ids.toDF("id").repartition(7)
      .agg(bitmap_agg(col("id")).as("bm")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(one, many))
  }

  test("bitmap_and_card matches the brute-force intersection") {
    val a = Seq(1L, 2L, 3L, 70000L, 70001L, 1L << 33)
    val b = Seq(2L, 3L, 4L, 70001L, (1L << 33) + 1)
    val df = a.map(("a", _)).union(b.map(("b", _))).toDF("side", "id")
    val bm = df.groupBy(col("side")).agg(bitmap_agg(col("id")).as("bm"))
    val got = bm.as("x").join(bm.as("y"),
        col("x.side") === lit("a") && col("y.side") === lit("b"))
      .select(bitmap_and_card(col("x.bm"), col("y.bm")))
      .as[Long].head()
    assert(got == a.toSet.intersect(b.toSet).size.toLong)
  }

  test("bitmap_or_agg unions pre-aggregated bitmaps exactly") {
    import BitmapAgg.bitmap_or_agg
    // three groups with overlapping members; OR of the three bitmaps
    // must equal the distinct count of the union
    val df = Seq(("g1", 1L), ("g1", 2L), ("g2", 2L), ("g2", 70000L),
      ("g3", 1L), ("g3", -5L)).toDF("g", "id")
    val got = df.groupBy(col("g")).agg(bitmap_agg(col("id")).as("bm"))
      .agg(bitmap_card(bitmap_or_agg(col("bm"))).as("n"))
      .as[Long].head()
    assert(got == 4L) // {1, 2, 70000, -5}
  }

  test("disjoint chunk ranges intersect to zero") {
    assert(Bitmaps.andCardinality(
      Bitmaps.serialize({ val m = new ChunkBitmap; m.add(5L); m }),
      Bitmaps.serialize({ val m = new ChunkBitmap; m.add(5L + (1L << 20)); m })
    ) == 0L)
  }
}
