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
    val sh = Dedup.shingles(d, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    time("shingles")(sh.count())
    time("shingles_again")(sh.count())
    val a = sh.select(col("doc_id").as("id1"), col("shingle"))
    val b = sh.select(col("doc_id").as("id2"), col("shingle"))
    val inter = a.join(b, Seq("shingle")).filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("ix"))
    time("inter")(inter.count())
    time("full")(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.2).count())
    time("full_again")(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.2).count())
    spark.stop()
  }
}
