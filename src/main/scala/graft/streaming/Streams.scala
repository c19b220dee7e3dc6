package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — the natural streaming extension of
  * the reference's batch/OLTP model (SURVEY §1.3): the `Transaction`
  * ledger and trade flow become streams; balances/holdings stay the
  * same event-sourced folds, now incrementally maintained.
  *
  * Everything here works identically on `readStream` sources and on
  * batch frames (used by the batch-equivalence oracle queries):
  * transformations are source-agnostic.
  */
object Streams {

  /** Watermarked tumbling-window aggregation over an event stream —
    * counts + exact DECIMAL sums per (window, event_type). Late rows
    * beyond the watermark are dropped; state is bounded by
    * (#windows in watermark) × (#types). */
  def windowedEventAgg(events: DataFrame, windowLen: String,
                       watermark: String = "10 minutes"): DataFrame = {
    val base = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    base
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
  }

  /** Streaming deposit/withdraw ledger → running balances per account
    * (U5 as a stream): aggregation state is one (sum, count) pair per
    * account, updated incrementally in Complete/Update mode. */
  def balanceStream(ledger: DataFrame, account: String): DataFrame =
    ledger.groupBy(col(account))
      .agg(sum(col("value").cast("decimal(18,2)")).as("balance"),
        count(lit(1)).as("n_tx"))

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(nEvents: Long, total: Double, lastTs: Long)
  case class SessionOut(user_id: Long, n_events: Long, total: Double,
                        closed_by_timeout: Boolean)

  /** Session tracking with custom state (flatMapGroupsWithState) —
    * the KeyValueGroupedDataset path for logic windows can't express:
    * a session closes after `gapMs` of inactivity per user, emitting
    * one summary row. State per key is O(1). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            if (st.nEvents > 0 && t - st.lastTs > gapMs) {
              out += SessionOut(uid, st.nEvents, st.total, closed_by_timeout = true)
              st = SessionState(0L, 0.0, Long.MinValue)
            }
            st = SessionState(st.nEvents + 1, st.total + e.value, t)
          }
          state.update(st)
          out.iterator
      }
  }
}
