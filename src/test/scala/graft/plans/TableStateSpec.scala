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
