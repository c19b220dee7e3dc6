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
    // d2 stage breakdown
    val sh = Dedup.shingles(d, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    time("shingles_scan")(sh.count())
    time("shingles_again")(sh.count())
    val shP = sh.persist()
    time("persist_materialize")(shP.count())
    val counts = shP.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    time("doc_counts")(counts.count())
    val a = shP.select(col("doc_id").as("id1"), col("shingle"))
    val b = shP.select(col("doc_id").as("id2"), col("shingle"))
    val inter = a.join(b, Seq("shingle")).filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("ix"))
    time("selfjoin_inter")(inter.count())
    shP.unpersist()
    time("d2_full_capped")(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.2,
      maxDf = Some(20)).count())
    graft.ops.CacheScope.releaseAll()
    time("d2_full_again")(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.2,
      maxDf = Some(20)).count())
    graft.ops.CacheScope.releaseAll()
    spark.stop()
  }
}
