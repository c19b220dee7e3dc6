package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  private def rows(seed: Int, n: Int): DataFrame =
    spark.range(0, n).select(
      (xxhash64(col("id") + seed) % 7).as("k"),
      ((xxhash64(col("id") * 31 + seed) % 10000).cast("double") / 100)
        .as("v"))

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("k").collect().map(_.toString).toSeq

  test("refresh(state(A), B) equals state(A ∪ B) exactly") {
    val a = rows(1, 2000)
    val b = rows(2, 500)
    val direct = IncrementalAgg.state(a.unionAll(b), Seq("k"), Seq("v"))
    val inc = IncrementalAgg.refresh(
      IncrementalAgg.state(a, Seq("k"), Seq("v")), b, Seq("k"), Seq("v"))
    assert(canon(inc) == canon(direct))
  }

  test("multi-batch folds associate; fresh groups appear, untouched pass through") {
    val a = rows(3, 1000).filter(col("k") >= 0) // hash gives ±; keep mixed
    val b = rows(4, 300)
    val c = rows(5, 300)
    val oneGo = IncrementalAgg.state(a.unionAll(b).unionAll(c),
      Seq("k"), Seq("v"))
    val folded = Seq(b, c).foldLeft(IncrementalAgg.state(a, Seq("k"), Seq("v")))(
      (st, d) => IncrementalAgg.refresh(st, d, Seq("k"), Seq("v")))
    assert(canon(folded) == canon(oneGo))
  }

  test("empty delta is an exact no-op") {
    val a = rows(6, 800)
    val st = IncrementalAgg.state(a, Seq("k"), Seq("v"))
    val refreshed = IncrementalAgg.refresh(st, a.filter(lit(false)),
      Seq("k"), Seq("v"))
    assert(canon(refreshed) == canon(st))
  }

  test("applyChangeFeed(retractableState(T0), feed) equals retractableState(T1)") {
    val t0 = rows(21, 2000)
    // window: delete a deterministic subset of T0, insert fresh rows
    val deleted = t0.filter(xxhash64(col("k"), col("v")) % 3 === 0)
    val inserted = rows(22, 400)
    val t1 = t0.exceptAll(deleted).unionAll(inserted)
    val feed = inserted.withColumn("_change_type", lit("insert"))
      .unionByName(deleted.withColumn("_change_type", lit("delete")))
    val direct = IncrementalAgg.retractableState(t1, Seq("k"), Seq("v"))
    val inc = IncrementalAgg.applyChangeFeed(
      IncrementalAgg.retractableState(t0, Seq("k"), Seq("v")),
      feed, Seq("k"), Seq("v"))
    assert(canon(inc) == canon(direct))
  }

  test("a fully-deleted group drops from the retractable state") {
    val t0 = rows(23, 600)
    val gone = t0.filter(col("k") === 2)
    assert(gone.count() > 0)
    val feed = gone.withColumn("_change_type", lit("delete"))
    val inc = IncrementalAgg.applyChangeFeed(
      IncrementalAgg.retractableState(t0, Seq("k"), Seq("v")),
      feed, Seq("k"), Seq("v"))
    assert(inc.filter(col("k") === 2).isEmpty)
    assert(canon(inc) == canon(
      IncrementalAgg.retractableState(t0.filter(col("k") =!= 2),
        Seq("k"), Seq("v"))))
  }

  test("an unknown change tag fails loudly, never corrupts counts") {
    val t0 = rows(24, 100)
    val feed = t0.limit(5).withColumn("_change_type", lit("upsert"))
    val ex = intercept[Exception] {
      IncrementalAgg.applyChangeFeed(
        IncrementalAgg.retractableState(t0, Seq("k"), Seq("v")),
        feed, Seq("k"), Seq("v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("insert/delete")))
  }

  // ---- IncrementalJoin ----

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("refreshJoin(joinState(A,B), ΔA, ΔB) equals the full re-join as a multiset") {
    val a = rows(11, 400)      // dup keys on both sides → multiplicities matter
    val da = rows(12, 150)
    val b = rows(13, 120).withColumnRenamed("v", "w")
    val db = rows(14, 60).withColumnRenamed("v", "w")
    val direct = IncrementalJoin.joinState(
      a.unionAll(da), b.unionAll(db), Seq("k"))
    val inc = IncrementalJoin.refreshJoin(
      IncrementalJoin.joinState(a, b, Seq("k")), a, b, da, db, Seq("k"))
    assert(multiset(inc) == multiset(direct))
  }

  test("refreshJoin with one empty delta only adds the other side's matches") {
    val a = rows(15, 300)
    val b = rows(16, 100).withColumnRenamed("v", "w")
    val db = rows(17, 50).withColumnRenamed("v", "w")
    val direct = IncrementalJoin.joinState(a, b.unionAll(db), Seq("k"))
    val inc = IncrementalJoin.refreshJoin(
      IncrementalJoin.joinState(a, b, Seq("k")),
      a, b, a.filter(lit(false)), db, Seq("k"))
    assert(multiset(inc) == multiset(direct))
  }
}
