package graft.api

import graft.fuzz.QueryFuzzer

/** The randomized-differential gate (verdict-r18 task 5): the
  * [[QueryFuzzer]] corpus — 288 seeded random compositions over the
  * harness tables (filter/join/agg/distinct in the frozen 0-119
  * range; EXISTS/windows/top-k in v3 120-179; CASE/IN/HAVING/set-ops/
  * scalar-subqueries in v4 180-239; composite window-over-join /
  * agg-over-semi / top-k-over-join shapes in v5 240-287) — each
  * reduced to one (q, n_rows, chk) digest row and unioned into a
  * single result. The
  * driver replays [[QueryFuzzer.digestAllSql]] in DuckDB, so every
  * round hash-compares all 288 random queries cross-engine; FuzzSpec
  * separately replays each query's SQL through `spark.sql` and
  * row-compares it against the DataFrame rendering (dual-frontend
  * check). A digest mismatch minimizes to its query index
  * (`QueryFuzzer.query(i)`), which then gets promoted to a named
  * gate. */
object FuzzQueries {
  val entries: Seq[Q] = Seq(
    Q("c17_fuzz_differential",
      (s, dir) => QueryFuzzer.digestAll(s, dir),
      Some(QueryFuzzer.digestAllSql)))
}
