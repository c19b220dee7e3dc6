package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The cash ledger — the reference's append-only `Transaction` table
  * (`sql/schema.sql:75-81`), written on deposit/withdraw/buy/sell and
  * read back as a statement (`portfolio.js:253-257`).
  *
  * Event-sourced: balances are folds over the ledger, never mutable
  * state (the Spark restatement of `UPDATE Portfolio SET CashBalance =
  * CashBalance ± $1`, `portfolio.js:162-174` / `:193-217`).
  */
object Ledger {

  /** Current balance per account: one partial-combine hash agg.
    * Amounts go through DECIMAL so the fold is exact regardless of
    * aggregation order. */
  def balances(ledger: DataFrame, account: String, amount: Column): DataFrame =
    ledger.groupBy(col(account))
      .agg(sum(amount.cast("decimal(18,2)")).as("balance"),
           count(lit(1)).as("n_tx"))

  /** Statement with running balance — the reference shows the raw
    * statement newest-first (`portfolio.js:253-257`); the running
    * column is the natural window extension (rowsBetween unbounded
    * preceding → current, per account, time-ordered). */
  def statement(ledger: DataFrame, account: String, amount: Column,
                ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(account)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ledger.withColumn("running_balance",
      sum(amount.cast("decimal(18,2)")).over(w))
  }

  /** Withdrawals that would drive the balance negative — the
    * reference's precheck (`portfolio.js:198-205`) as a set-based
    * verdict over the whole ledger (running balance < 0 marks the
    * first offending row and everything after it). */
  def overdrafts(ledger: DataFrame, account: String, amount: Column,
                 ord: Seq[Column]): DataFrame =
    statement(ledger, account, amount, ord)
      .filter(col("running_balance") < 0)
}
