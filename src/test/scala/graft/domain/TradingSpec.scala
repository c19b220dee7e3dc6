package graft.domain

import graft.SparkSpec

/** Hand-computed fixtures for the avg-cost fold branches the SQL
  * oracle cannot express (reject, full-sell reset) — reference
  * semantics from trading.js:76-97 (buy), :159-199 (sell). */
class TradingSpec extends SparkSpec {
  import spark.implicits._

  private def run(trades: Seq[Trade]): Map[(Long, String), Holding] =
    Trading.replay(trades.toDS()).collect()
      .map(h => (h.portfolio, h.symbol) -> h).toMap

  test("buy into empty position sets avg = price") {
    val h = run(Seq(Trade(1, "A", 1, 1, "BUY", 10, 5.0)))((1L, "A"))
    assert(h.shares == 10 && h.avg_cost == 5.0 && h.n_rejected == 0)
  }

  test("second buy re-weights the average (trading.js:83-85)") {
    // (5*10 + 10*8) / 20 = 6.5
    val h = run(Seq(
      Trade(1, "A", 1, 1, "BUY", 10, 5.0),
      Trade(1, "A", 2, 2, "BUY", 10, 8.0)))((1L, "A"))
    assert(h.shares == 20 && h.avg_cost == 6.5)
  }

  test("partial sell keeps avg unchanged (trading.js:185-192)") {
    val h = run(Seq(
      Trade(1, "A", 1, 1, "BUY", 10, 5.0),
      Trade(1, "A", 2, 2, "SELL", 4, 9.0)))((1L, "A"))
    assert(h.shares == 6 && h.avg_cost == 5.0)
  }

  test("full sell closes the position (trading.js:194-199)") {
    val got = run(Seq(
      Trade(1, "A", 1, 1, "BUY", 10, 5.0),
      Trade(1, "A", 2, 2, "SELL", 10, 9.0)))
    assert(!got.contains((1L, "A")))
  }

  test("re-buy after full sell restarts the average") {
    val h = run(Seq(
      Trade(1, "A", 1, 1, "BUY", 10, 5.0),
      Trade(1, "A", 2, 2, "SELL", 10, 9.0),
      Trade(1, "A", 3, 3, "BUY", 4, 100.0)))((1L, "A"))
    assert(h.shares == 4 && h.avg_cost == 100.0)
  }

  test("oversell is rejected, state untouched (trading.js:159-163)") {
    val h = run(Seq(
      Trade(1, "A", 1, 1, "BUY", 10, 5.0),
      Trade(1, "A", 2, 2, "SELL", 11, 9.0)))((1L, "A"))
    assert(h.shares == 10 && h.avg_cost == 5.0 && h.n_rejected == 1)
  }

  test("closed position with a rejected sell still surfaces, avg reset to 0") {
    // the rejection count must stay observable even though the
    // position closed (the plain close case emits nothing); avg is
    // 0.0 — the reference DELETEs the row, so no cost basis survives
    val h = run(Seq(
      Trade(1, "A", 1, 1, "BUY", 5, 10.0),
      Trade(1, "A", 2, 2, "SELL", 20, 9.0), // oversell: rejected
      Trade(1, "A", 3, 3, "SELL", 5, 9.0)))((1L, "A"))
    assert(h.shares == 0 && h.avg_cost == 0.0 && h.n_rejected == 1)
  }

  test("same-timestamp trades resolved by seq tiebreaker") {
    // seq order: buy 10@5 then sell 10 → closed; reversed would reject
    val got = run(Seq(
      Trade(1, "A", 5, 2, "SELL", 10, 9.0),
      Trade(1, "A", 5, 1, "BUY", 10, 5.0)))
    assert(!got.contains((1L, "A")))
  }

  test("keys are independent") {
    val got = run(Seq(
      Trade(1, "A", 1, 1, "BUY", 10, 5.0),
      Trade(1, "B", 1, 1, "BUY", 3, 7.0),
      Trade(2, "A", 1, 1, "BUY", 1, 2.0)))
    assert(got.size == 3 && got((1L, "B")).avg_cost == 7.0)
  }

  test("row order of the input dataset is irrelevant") {
    val trades = Seq(
      Trade(1, "A", 3, 3, "SELL", 5, 0.0),
      Trade(1, "A", 1, 1, "BUY", 10, 4.0),
      Trade(1, "A", 2, 2, "BUY", 10, 6.0))
    val a = run(trades)((1L, "A"))
    val b = run(trades.reverse)((1L, "A"))
    assert(a == b && a.shares == 15 && a.avg_cost == 5.0)
  }
}
