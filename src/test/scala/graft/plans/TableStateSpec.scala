package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Pins the table-state fingerprint the constraint/MV registries stamp
  * at declaration: it moves on any append, holds on a no-op, an empty
  * stamp always matches (caller-owns-freshness legacy contract), and
  * the per-planning-pass [[FpCache]] probes each root at most once
  * however often it is consulted. */
class TableStateSpec extends SparkSpec {

  private val root = System.getProperty("java.io.tmpdir") + "/graft_tsspec_" +
    java.util.UUID.randomUUID().toString.take(8)

  test("fingerprint holds on a no-op, moves on an append, empty stamp always matches") {
    import spark.implicits._
    val p = root + "/t"
    Tables.load(spark, sf, "region").select(col("r_regionkey").as("k"))
      .write.mode("overwrite").parquet(p)
    val fp = TableState.fingerprint(spark, Set(p))
    assert(TableState.matches(spark, fp, Set(p)))
    assert(TableState.matches(spark, "", Set(p)), "empty stamp = caller owns freshness")
    Seq(99L).toDF("k").write.mode("append").parquet(p)
    assert(!TableState.matches(spark, fp, Set(p)),
      "an appended file must move the fingerprint")
    val fp2 = TableState.fingerprint(spark, Set(p))
    assert(TableState.matches(spark, fp2, Set(p)))
  }

  test("a declaration over a STALE frame refuses (pinned listing vs live files)") {
    import spark.implicits._
    val p = root + "/t_fresh"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(p)
    // this frame pins its file listing NOW…
    val frame = spark.read.parquet(p)
    // …and the table moves behind its back. The appended row would be
    // covered by the declaration's fingerprint but invisible to the
    // audit (which scans the pinned listing) — declare must refuse.
    Seq((2L, "dup")).toDF("k", "v").write.mode("append").parquet(p)
    val ex = intercept[IllegalArgumentException] {
      DistinctElim.declareUniqueKey("tsspec_stale", frame, Seq("k"))
    }
    assert(ex.getMessage.contains("re-read"), ex.getMessage)
    assert(PkCatalog.get("tsspec_stale").isEmpty)
    // a fresh read declares fine — wait, the duplicate k=2 now exists,
    // so the audit itself must refuse (proving the append was real)
    intercept[IllegalArgumentException] {
      DistinctElim.declareUniqueKey("tsspec_stale",
        spark.read.parquet(p), Seq("k"))
    }
  }

  test("FpCache probes each root exactly once per pass, any number of consultations") {
    val p = root + "/t_memo"
    Tables.load(spark, sf, "region").select(col("r_regionkey").as("k"))
      .write.mode("overwrite").parquet(p)
    val fp = TableState.fingerprint(spark, Set(p))
    val before = TableState.probes.get()
    val c = new FpCache(spark)
    (1 to 5).foreach(_ => assert(c.matches(fp, Set(p))))
    assert(TableState.probes.get() - before == 1L,
      "five consultations of one root must cost one probe")
    // a fresh pass re-probes (no staleness window across passes)
    assert(new FpCache(spark).matches(fp, Set(p)))
    assert(TableState.probes.get() - before == 2L)
  }
}
