package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral / product analytics over an event log — funnel and
  * cohort-retention, the two queries every events table gets asked
  * first. The reference records the raw material for both (the
  * Transaction ledger, `portfolio.js:162-174`, is an event log) but
  * answers neither; an engine replacing it at 100 TB should.
  */
object Behavior {

  /** Ordered funnel: a user completes step i only with an event of
    * `steps(i)` STRICTLY AFTER their first qualifying completion of
    * step i-1 (first-touch attribution) — and, when `withinMs` is
    * set, no later than that completion plus the conversion window
    * (the standard product-analytics cutoff: a purchase a month
    * after the view doesn't convert the view). Returns one row per
    * step: (step, event_type, users).
    *
    * Shape: one pass over `events` per step (N = steps.size, small
    * and fixed), each an equi-join of the filtered event scan against
    * the previous step's frontier (one row per surviving user) and a
    * min-agg back to a frontier. Frontiers are the only shuffled
    * state; at bounded user cardinality AQE broadcasts them. Never a
    * per-user sort of the whole log.
    */
  def funnelSteps(events: DataFrame, user: String, time: String,
                  typeCol: String, steps: Seq[String],
                  withinMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: need at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(user)).agg(min(col(time)).as("__t"))
    val frontiers = steps.tail.scanLeft(first) { (prev, st) =>
      // µs arithmetic: the event log is µs-precision and a millis
      // round-trip would truncate the cutoff
      val inWindow = withinMs.fold(lit(true)) { ms =>
        col(time) <= timestamp_micros(
          unix_micros(col("__prev_t")) + lit(ms * 1000L))
      }
      events.filter(col(typeCol) === st)
        .join(prev.select(col(user), col("__t").as("__prev_t")), user)
        .filter(col(time) > col("__prev_t") && inWindow)
        .groupBy(col(user)).agg(min(col(time)).as("__t"))
    }
    steps.zip(frontiers).zipWithIndex.map { case ((st, f), i) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"),
          col("users"))
    }.reduce(_ unionByName _)
  }

  /** Weekly cohort retention: cohort = the Monday-aligned week of a
    * user's first event; one output row per (cohort_week,
    * week_offset) with the count of cohort users active that week.
    * Two aggregations and one join — the classic retention triangle,
    * never a window over the whole log. Offsets are exact integer
    * arithmetic on epoch seconds (week truncation is DST-free in
    * UTC-pinned sessions — the repo-wide convention).
    */
  def cohortRetention(events: DataFrame, user: String, time: String): DataFrame = {
    val week = date_trunc("week", col(time))
    val activity = events.select(col(user), week.as("week")).distinct()
    val cohorts = activity.groupBy(col(user))
      .agg(min(col("week")).as("cohort_week"))
    activity.join(cohorts, user)
      .withColumn("week_offset",
        ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week")))
          / 604800L).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** BATCH gap-based sessionization — the historical-reprocessing
    * complement of [[graft.streaming.Streams]]' stateful sessionize
    * (st2): a session breaks where the gap since the user's previous
    * event exceeds `gapMinutes`. One row per session: (user,
    * session_id (1-based per user), session_start, session_end,
    * n_events).
    *
    * Shape: lag + running-sum windows partitioned by the USER KEY
    * ONLY (shuffles once on user, never a global single-partition
    * window), then one hash aggregation on (user, session_id). Gap
    * arithmetic is µs-exact (the event log's precision). Both windows
    * keep the default RANGE frame over the event time, so rows tied
    * on (user, ts) — duplicate ticks — deterministically land in the
    * same session with the same id regardless of physical order, and
    * the output needs no tie-break column to be stable. */
  def sessionize(events: DataFrame, user: String, time: String,
                 gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user)).orderBy(col(time))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events.select(col(user), col(time))
      .withColumn("__new",
        when(col(time).isNull, lit(0L)) // null ts: degenerate, one bucket
          .when(lag(col(time), 1).over(w).isNull, lit(1L))
          .when(unix_micros(col(time)) -
            unix_micros(lag(col(time), 1).over(w)) > gapUs, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("session_id", sum(col("__new")).over(w))
      .groupBy(col(user), col("session_id"))
      .agg(min(col(time)).as("session_start"),
        max(col(time)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** EVENT-TRANSITION MATRIX — first-order Markov counts over each
    * user's event stream: for every ordered adjacent pair in a user's
    * timeline, count (state → next state) across all users. The
    * "what do users do after X" analysis behind product funnels and
    * next-action models; row-normalizing the counts gives the Markov
    * transition probabilities.
    *
    * One lead() window per user (the same single-shuffle discipline
    * as [[sessionize]]) + one hash aggregation on the (from, to)
    * pair. `tiebreak` pins the order of same-timestamp events —
    * without a total order the adjacency itself would be
    * nondeterministic (unlike sessionize, a RANGE frame cannot save
    * an operator whose OUTPUT is the ordering). A user's last event
    * has no successor and contributes nothing. */
  def transitions(events: DataFrame, user: String, time: String,
                  state: String, tiebreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user))
      .orderBy((Seq(time) ++ tiebreak).map(col): _*)
    events.select((Seq(user, time, state) ++ tiebreak).map(col): _*)
      .withColumn("__next", lead(col(state), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(state).as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("n"))
  }
}
