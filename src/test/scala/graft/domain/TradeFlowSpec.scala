package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The full buy/sell batch flow (SURVEY §3 trace 2): guards → fold →
  * ledger, as one pipeline. */
class TradeFlowSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    (1L, "AAA", 1L, 1L, "BUY", 10.0, 5.0),    // ok
    (1L, "AAA", 2L, 2L, "SELL", 4.0, 9.0),    // ok
    (1L, "ZZZ", 3L, 3L, "BUY", 1.0, 1.0),     // unknown symbol
    (9L, "AAA", 4L, 4L, "BUY", 1.0, 1.0),     // no portfolio
    (1L, "AAA", 5L, 5L, "BUY", 0.0, 1.0),     // nonpositive qty
    (2L, "AAA", 6L, 6L, "BUY", 100.0, 100.0)  // insufficient cash
  ).toDF("portfolio", "symbol", "ts", "seq", "side", "qty", "price")

  private def balances = Seq((1L, 1000.0), (2L, 50.0)).toDF("portfolio", "balance")
  private def symbols = Seq("AAA", "BBB").toDF("symbol")

  test("validate applies the reference's guard order (trading.js:45-73)") {
    val v = Trading.validate(trades, balances, symbols)
      .select("seq", "verdict").as[(Long, String)].collect().toMap
    assert(v == Map(1L -> "ACCEPT", 2L -> "ACCEPT",
      3L -> "REJECT_UNKNOWN_SYMBOL", 4L -> "REJECT_NO_PORTFOLIO",
      5L -> "REJECT_NONPOSITIVE", 6L -> "REJECT_INSUFFICIENT_CASH"))
  }

  test("applyTrades: accepted trades fold to holdings + formatted ledger") {
    val (verdicts, holdings, ledger) = Trading.applyTrades(trades, balances, symbols)
    assert(verdicts.filter($"verdict" === "ACCEPT").count() == 2)
    val h = holdings.select("portfolio", "symbol", "shares", "avg_cost")
      .as[(Long, String, Double, Double)].collect().toSeq
    assert(h == Seq((1L, "AAA", 6.0, 5.0)))
    val l = ledger.orderBy("seq")
      .select($"amount".cast("double"), $"detail")
      .as[(Double, String)].collect().toSeq
    assert(l == Seq(
      (-50.0, "Bought 10 shares of AAA at $5.00 each."),
      (36.0, "Sold 4 shares of AAA at $9.00 each.")))
  }
}
