package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Dedup

/** Scratch profiling main for hot queries (dev tool). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    d.count()
    // d4 stages
    val sigs = Dedup.simHash64(d, "doc_id", "text")
    time("simhash_sigs")(sigs.count())
    time("simhash_pairs")(Dedup.simHashPairs(sigs, "doc_id", 8, 6).count())
    time("d4_full") {
      val s2 = Dedup.simHash64(d, "doc_id", "text")
      Dedup.simHashPairs(s2, "doc_id", 8, 6).count()
    }
    // d2 stages
    val sh = Dedup.shingles(d, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    time("shingles")(sh.count())
    time("d2_full")(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.2).count())
    spark.stop()
  }
}
