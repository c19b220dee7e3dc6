package graft.domain

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A trade event — the engine's row form of the reference's buy/sell
  * request bodies (`trading.js:16-116` buy, `:119-227` sell).
  *
  * `seq` is the same-timestamp tiebreaker (the reference's implicit
  * TransactionID insertion order — SURVEY §7.4 risk 3).
  */
case class Trade(portfolio: Long, symbol: String, ts: Long, seq: Long,
                 side: String, qty: Double, price: Double)

/** Final holding state per (portfolio, symbol) — the reference's
  * `Holdings(PortfolioID, Symbol, Shares, AvgCostBasis)` row
  * (`sql/schema.sql:91-99`). */
case class Holding(portfolio: Long, symbol: String,
                   shares: Double, avg_cost: Double, n_rejected: Long)

/** The buy/sell cost-basis fold — the one genuinely order-dependent
  * computation in the reference (SURVEY §2.4 A8, §7.3):
  *
  *   - buy into empty position: shares=qty, avg=price
  *     (`trading.js:92-97` INSERT branch)
  *   - buy into open position:  avg = (avg*shares + price*qty)/(shares+qty)
  *     (`trading.js:83-85`)
  *   - sell with qty > shares: rejected (`trading.js:159-163` guard)
  *   - partial sell: shares -= qty, avg unchanged (`trading.js:185-192`)
  *   - full sell: position deleted (`trading.js:194-199`); a later buy
  *     restarts the average from scratch
  *
  * The recurrence is not prefix-decomposable (the average resets at
  * position close), so it cannot be a plain SQL aggregate: it is an
  * ordered fold per key. Implemented as groupByKey + per-group sort +
  * fold — one shuffle on (portfolio, symbol); each group is one
  * instrument's trade history, small by construction, so the in-memory
  * group sort is safe at any total scale.
  */
object Trading {

  /** Replay guarded trades to final holdings. Event-sourced: the trade
    * log is authoritative (fixes the reference's non-atomic
    * 6-statement flow — SURVEY §2.9 caveat); holdings are a pure fold.
    * Closed positions (shares == 0) are dropped, matching the
    * reference's DELETE on full sell. */
  def replay(trades: Dataset[Trade]): Dataset[Holding] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(t => (t.portfolio, t.symbol))
      .flatMapGroups { (key: (Long, String), it: Iterator[Trade]) =>
        val (pf, sym) = key
        var shares = 0.0
        var avg = 0.0
        var rejected = 0L
        it.toSeq.sortBy(t => (t.ts, t.seq)).foreach { t =>
          if (t.side == "BUY") {
            if (shares == 0.0) { shares = t.qty; avg = t.price }
            else {
              avg = (avg * shares + t.price * t.qty) / (shares + t.qty)
              shares += t.qty
            }
          } else { // SELL
            if (t.qty > shares) rejected += 1
            else {
              shares -= t.qty
              if (shares == 0.0) avg = 0.0
            }
          }
        }
        if (shares == 0.0 && rejected == 0L) Iterator.empty
        else Iterator.single(Holding(pf, sym, shares, avg, rejected))
      }
  }

  /** Untyped convenience: DataFrame in (same column names as Trade),
    * holdings DataFrame out. */
  def replayDf(trades: DataFrame): DataFrame = {
    import trades.sparkSession.implicits._
    replay(trades.as[Trade]).toDF()
  }

  /** Validation pass producing accept/reject verdicts for a batch of
    * candidate trades against current cash/holdings — the reference's
    * per-request guards (`trading.js:45-73`: ownership, symbol exists,
    * positive qty, sufficient cash) as set-based joins instead of four
    * round trips per trade. */
  def validate(trades: DataFrame, balances: DataFrame, symbols: DataFrame): DataFrame = {
    val withBal = trades
      .join(broadcast(balances.select(col("portfolio"), col("balance"))),
        Seq("portfolio"), "left")
      .join(broadcast(symbols.select(col("symbol"))
          .withColumn("symbol_known", lit(true))),
        Seq("symbol"), "left")
    withBal.withColumn("verdict",
      // the reference rejects pricePerShareNum <= 0 on both buy and
      // sell (trading.js:101,148) — zero is not a valid price
      when(col("qty") <= 0 || col("price") <= 0, "REJECT_NONPOSITIVE")
        .when(col("symbol_known").isNull, "REJECT_UNKNOWN_SYMBOL")
        .when(col("balance").isNull, "REJECT_NO_PORTFOLIO")
        .when(col("side") === "BUY" && col("qty") * col("price") > col("balance"),
          "REJECT_INSUFFICIENT_CASH")
        .otherwise("ACCEPT"))
      .drop("balance", "symbol_known")
  }

  /** Ledger rows for accepted trades — the `Transaction` append the
    * reference performs per trade (`trading.js:105-109` buy,
    * `:215-219` sell), including a formatted Detail string and the
    * signed amount (buys debit, sells credit). The Detail uses fixed
    * %.0f/%.2f formatting, which pads/rounds where JS number printing
    * drops trailing zeros (`$123.50` here vs `$123.5` there) — the
    * numeric `amount` column, not the display string, is the
    * load-bearing value. */
  def ledgerEntries(acceptedTrades: DataFrame): DataFrame =
    acceptedTrades.select(
      col("portfolio").as("portfolioid"),
      when(col("side") === "BUY", -col("qty") * col("price"))
        .otherwise(col("qty") * col("price"))
        .cast("decimal(12,2)").as("amount"),
      format_string("%s %.0f shares of %s at $%.2f each.",
        when(col("side") === "BUY", "Bought").otherwise("Sold"),
        col("qty"), col("symbol"), col("price")).as("detail"),
      col("ts"), col("seq"))

  /** The full buy/sell batch flow (SURVEY §3 trace 2) as ONE pipeline:
    * validate against balances/symbols → fold accepted trades to
    * holdings → emit ledger rows. The reference runs 6 auto-committed
    * statements per trade; here the whole batch is pure and atomic-
    * by-construction (event-sourced). Returns (verdicts, holdings,
    * ledger). */
  def applyTrades(trades: DataFrame, balances: DataFrame,
                  symbols: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val verdicts = validate(trades, balances, symbols)
    val accepted = verdicts.filter(col("verdict") === "ACCEPT")
      .select("portfolio", "symbol", "ts", "seq", "side", "qty", "price")
    (verdicts, replayDf(accepted), ledgerEntries(accepted))
  }
}
