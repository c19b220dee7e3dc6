package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsExtraSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // key 1 is hot: 500 of 520 rows
    val left = ((1 to 500).map(i => (1, i)) ++ (1 to 20).map(i => (2, i)))
      .toDF("k", "v")
    val right = Seq((1, "hot"), (2, "cold"), (3, "orphan")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).orderBy("k", "v")
      .as[(Int, Int, String)].collect().toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), buckets = 8)
      .orderBy("k", "v").as[(Int, Int, String)].collect().toSeq
    assert(salted == plain && salted.length == 520)
  }

  test("saltedAgg equals plain aggregation") {
    val df = ((1 to 300).map(i => (1, i.toDouble)) ++ Seq((2, 5.0)))
      .toDF("k", "v")
    val got = Skew.saltedAgg(df, Seq("k"), buckets = 4,
        partials = Map("s" -> sum($"v"), "c" -> count(lit(1))),
        finals = Map("total" -> sum($"s"), "n" -> sum($"c")))
      .orderBy("k").as[(Int, Double, Long)].collect().toSeq
    assert(got == Seq((1, 300 * 301 / 2.0, 300L), (2, 5.0, 1L)))
  }

  test("allocateDense: contiguous ids after the existing max, stable order") {
    val existing = Seq((1L, "a"), (5L, "b")).toDF("id", "v")
    val fresh = Seq(("z", 3), ("x", 1), ("y", 2)).toDF("v", "ord")
    val got = Keys.allocateDense(fresh, "id", Keys.currentMax(existing, "id"),
        Seq(col("ord")))
      .select("id", "v").as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((6L, "x"), (7L, "y"), (8L, "z")))
  }

  test("allocateUnique: ids unique and beyond the existing max") {
    val fresh = (1 to 100).map(i => s"v$i").toDF("v")
    val ids = Keys.allocateUnique(fresh, "id", 1000L)
      .select("id").as[Long].collect()
    assert(ids.distinct.length == 100 && ids.forall(_ > 1000L))
  }

  test("Validate finds PK, FK, and CHECK violations precisely") {
    val t = Seq((1, "2024-01-01"), (1, "2024-01-01"), (2, "2024-01-01"))
      .toDF("symbol", "day")
    assert(Validate.primaryKey(t, Seq("symbol", "day")).count() == 1)

    val parent = Seq(1, 2).toDF("pid")
    val child = Seq((1, "ok"), (3, "orphan")).toDF("pid", "v")
    val fk = Validate.foreignKey(child, parent, Seq("pid"), Seq("pid"))
    assert(fk.as[(Int, String)].collect().toSeq == Seq((3, "orphan")))

    val h = Seq((1, 5), (2, -3)).toDF("pid", "shares")
    assert(Validate.check(h, $"shares" >= 0).count() == 1)

    val audit = Validate.audit(Map(
      "pk_stocks" -> Validate.primaryKey(t, Seq("symbol", "day")),
      "fk_holdings" -> fk,
      "check_shares" -> Validate.check(h, $"shares" >= 0)))
    assert(audit == Seq(("check_shares", 1L), ("fk_holdings", 1L), ("pk_stocks", 1L)))
  }

  test("custom vector expressions match HOF formulation bit-for-bit") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(-1.0, 0.5, 2.0))).toDF("a", "b")
    val custom = df.select(
      graft.functions.VectorExprs.dot_product($"a", $"b"),
      graft.functions.VectorExprs.cosine_sim($"a", $"b"))
      .as[(Double, Double)].head()
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .as[Double].head()
    assert(custom._1 == hof)
    assert(custom._1 == 6.0)
    assert(math.abs(custom._2 - 6.0 / (math.sqrt(14.0) * math.sqrt(5.25))) < 1e-15)
  }
}
