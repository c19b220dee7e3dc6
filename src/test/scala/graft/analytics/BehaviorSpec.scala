package graft.analytics

import graft.SparkSpec
import java.sql.Timestamp

/** Hand-checked semantics for the behavioral analytics: strict
  * ordering in the funnel, Monday week alignment + offsets in cohort
  * retention. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnelSteps: strict after-previous-step ordering, first-touch") {
    val events = Seq(
      // u1 completes all three in order
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2: purchase BEFORE the first view → stops at view
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 10:30:00"), "purchase"),
      (2L, ts("2024-01-02 11:00:00"), "view"),
      // u3: view before signup doesn't count; the later one does
      (3L, ts("2024-01-03 09:00:00"), "view"),
      (3L, ts("2024-01-03 10:00:00"), "signup"),
      (3L, ts("2024-01-03 10:00:00"), "view"), // SAME ts: excluded (strict >)
      (3L, ts("2024-01-03 11:00:00"), "view"),
      // u4 never signs up
      (4L, ts("2024-01-04 10:00:00"), "view"),
      (4L, ts("2024-01-04 11:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Behavior.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"))
      .orderBy("step")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "signup", 3L),   // u1, u2, u3
      (2L, "view", 3L),     // u1, u2 (11:00 > 10:00), u3 (11:00 only)
      (3L, "purchase", 1L)))// u1 only (u2's purchase precedes its view)
  }

  test("funnelSteps: conversion window drops late completions") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:30:00"), "view"),   // within 1h → converts
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 12:00:01"), "view"))   // 2h+1s later → dropped
      .toDF("user_id", "ts", "event_type")
    val got = Behavior.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("signup", "view"), withinMs = Some(2L * 3600 * 1000))
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "signup", 2L), (2L, "view", 1L)))
    // boundary is inclusive: exactly +window converts
    val boundary = Seq(
      (3L, ts("2024-01-03 10:00:00"), "signup"),
      (3L, ts("2024-01-03 12:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val b = Behavior.funnelSteps(boundary, "user_id", "ts", "event_type",
        Seq("signup", "view"), withinMs = Some(2L * 3600 * 1000))
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(b == Seq((1L, "signup", 1L), (2L, "view", 1L)))
  }

  test("sessionize: gap breaks, boundary-exact gap keeps, ties share a session") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:20:00")),  // 20 min < 30 → same session
      (1L, ts("2024-01-01 10:50:00")),  // exactly 30 min → same (strict >)
      (1L, ts("2024-01-01 12:00:00")),  // 70 min → new session
      (1L, ts("2024-01-01 12:00:00")),  // duplicate tick → same session
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "t")
    val got = Behavior.sessionize(ev, "user_id", "t", gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:50:00"), 3L),
      (1L, 2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 2L),
      (2L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 1L)),
      got.toString)
  }

  test("cohortRetention: Monday-aligned cohorts, integer week offsets") {
    val events = Seq(
      // 2024-01-01 is a Monday; u1 active weeks 0, 1, 3
      (1L, ts("2024-01-02 10:00:00"), "view"),
      (1L, ts("2024-01-08 10:00:00"), "view"),
      (1L, ts("2024-01-10 10:00:00"), "click"), // same week as above
      (1L, ts("2024-01-25 10:00:00"), "view"),
      // u2 first active in week 1, returns week 2
      (2L, ts("2024-01-09 10:00:00"), "view"),
      (2L, ts("2024-01-15 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Behavior.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select($"cohort_week".cast("date").cast("string"),
        $"week_offset", $"users")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L), ("2024-01-01", 3L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("transitions: adjacent pairs per user, ties pinned, last event contributes nothing") {
    val events = Seq(
      // u1: a → b → b → c; u2: a → c (cross-user adjacency must NOT mix)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "b"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "c"),
      (2L, ts("2024-01-01 11:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 11:05:00"), 6L, "c"),
      // u3: two events at the SAME ts — event_id tiebreak makes x→y,
      // never y→x
      (3L, ts("2024-01-01 12:00:00"), 7L, "x"),
      (3L, ts("2024-01-01 12:00:00"), 8L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.transitions(events, "user_id", "ts", "event_type",
        tiebreak = Seq("event_id"))
      .orderBy("from_state", "to_state")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "b", 1L),
      ("b", "c", 1L), ("x", "y", 1L)))
  }
}
