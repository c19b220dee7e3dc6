package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized aggregate — the
  * warehouse answer to "the nightly rollup re-reads 100 TB to add one
  * day": keep the aggregate as MERGEABLE per-group states (count +
  * exact-decimal sum + min + max per value column), and fold each
  * new batch in with one delta-sized aggregation plus one outer join
  * — the base FACTS are never re-read. (The reference recomputes its
  * `statistics_cache` rows from scratch on every write-back,
  * `portfolio.js:427-445` — viable at Postgres scale, not at ours.)
  *
  * APPEND-ONLY contract: count/sum/min/max are all mergeable under
  * row insertion, so `refresh(state(A), B) ≡ state(A ∪ B)` exactly
  * (the IncrementalAggSpec property, and the u13 gate against a
  * direct full-recompute oracle). Deletions would need retractable
  * states (count/sum subtract; min/max do NOT retract — they'd need
  * a per-group sketch or recompute); route deletes through a rebuild.
  *
  * Derived statistics (avg = sum/count, etc.) are projections over
  * the state — compute them at READ time, never store them (they
  * don't merge).
  *
  * Scale shape: the delta aggregation shuffles only the batch; the
  * fold is one full-outer equi-join on the group keys — state-sized,
  * not fact-sized, and shuffle-free when both sides live bucketed on
  * the keys ([[graft.catalog.Bucketing]] / the Scd bucket
  * discipline). Sums are exact DECIMAL(28,2) — order-independent, so
  * any merge tree gives identical bits. */
object IncrementalAgg {

  private def sumT = "decimal(28,2)"

  /** Aggregate `df` into the mergeable state shape: one row per key
    * tuple with `__cnt` plus (`sum_c`, `min_c`, `max_c`) per value
    * column. */
  def state(df: DataFrame, keys: Seq[String],
            values: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__cnt") +: values.flatMap { c =>
      Seq(sum(col(c).cast("decimal(18,2)")).cast(sumT).as(s"sum_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold an append batch into an existing state:
    * `refresh(state(A), B) ≡ state(A ∪ B)`. Groups new to the batch
    * appear; untouched groups pass through bit-identical. */
  def refresh(st: DataFrame, delta: DataFrame, keys: Seq[String],
              values: Seq[String]): DataFrame = {
    val d = state(delta, keys, values)
    val renamed = (Seq("__cnt") ++ values.flatMap(c =>
      Seq(s"sum_$c", s"min_$c", s"max_$c")))
    val dR = renamed.foldLeft(d)((f, c) => f.withColumnRenamed(c, s"__d_$c"))
    val merged = Seq(
      (coalesce(col("__cnt"), lit(0L)) +
        coalesce(col("__d___cnt"), lit(0L))).as("__cnt")) ++
      values.flatMap { c =>
        Seq(
          (coalesce(col(s"sum_$c"), lit(0).cast(sumT)) +
            coalesce(col(s"__d_sum_$c"), lit(0).cast(sumT)))
            .cast(sumT).as(s"sum_$c"),
          least(col(s"min_$c"), col(s"__d_min_$c")).as(s"min_$c"),
          greatest(col(s"max_$c"), col(s"__d_max_$c")).as(s"max_$c"))
      }
    st.join(dR, keys, "full_outer")
      .select((keys.map(col) ++ merged): _*)
  }

  /** RETRACTABLE per-group state: `__cnt` plus exact-decimal `sum_c`
    * per value column — exactly the statistics that subtract, so the
    * state folds a change-data feed with DELETES, not just appends
    * (the Flink/Materialize retraction idea; min/max do NOT retract
    * and are deliberately absent — a view needing them under deletes
    * recomputes affected groups or keeps a per-group sketch).
    * Derived stats (avg = sum/cnt) are read-time projections, as in
    * [[state]]. */
  def retractableState(df: DataFrame, keys: Seq[String],
                       values: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__cnt") +: values.map(c =>
      sum(col(c).cast("decimal(18,2)")).cast(sumT).as(s"sum_$c"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a [[graft.catalog.Layout.changes]]-shaped feed (rows tagged
    * `_change_type` ∈ insert/delete) into a retractable state:
    * inserts add with weight +1, deletes subtract with weight −1, in
    * ONE delta-sized signed aggregation plus one state-sized outer
    * join — the base facts are never re-read, completing the loop the
    * append-only [[refresh]] can't close: storage-level CDC
    * ([[graft.catalog.Layout]] deletion vectors + change feed)
    * driving a materialized view through row REMOVALS at O(changed
    * data). Groups whose count reaches zero drop from the state, so
    * `applyChangeFeed(retractableState(T₀), changes(T₀→T₁)) ≡
    * retractableState(T₁)` exactly (the s26 oracle; net feed
    * semantics make over-retraction impossible for a feed produced by
    * the snapshot log). Scale shape matches [[refresh]]: the feed
    * aggregation shuffles only the window's changes; the fold join is
    * state-sized. */
  def applyChangeFeed(st: DataFrame, feed: DataFrame, keys: Seq[String],
                      values: Seq[String]): DataFrame = {
    // an unknown tag would silently corrupt counts — fail loudly,
    // in-pass (raise_error costs nothing on valid rows)
    val w = when(col("_change_type") === "insert", lit(1L))
      .when(col("_change_type") === "delete", lit(-1L))
      .otherwise(raise_error(concat(
        lit("applyChangeFeed: _change_type must be insert/delete, got "),
        col("_change_type"))).cast("long"))
    val signed = feed.withColumn("__w", w)
    val aggs = sum(col("__w")).as("__d___cnt") +: values.map(c =>
      sum(col("__w").cast(sumT) * col(c).cast("decimal(18,2)"))
        .cast(sumT).as(s"__d_sum_$c"))
    val d = signed.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val merged = Seq(
      (coalesce(col("__cnt"), lit(0L)) +
        coalesce(col("__d___cnt"), lit(0L))).as("__cnt")) ++
      values.map { c =>
        (coalesce(col(s"sum_$c"), lit(0).cast(sumT)) +
          coalesce(col(s"__d_sum_$c"), lit(0).cast(sumT)))
          .cast(sumT).as(s"sum_$c")
      }
    st.join(d, keys, "full_outer")
      .select((keys.map(col) ++ merged): _*)
      .filter(col("__cnt") > 0)
  }
}

/** Incremental maintenance of a materialized equi-JOIN view under
  * append-only deltas on both sides — the insert case of the counting
  * algorithm (Blakeley et al. 1986, by published form):
  *
  * {{{ (A ∪ ΔA) ⋈ (B ∪ ΔB)
  *     = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
  *     = M   ∪ ΔA⋈(B ∪ ΔB) ∪ A⋈ΔB }}}
  *
  * so a refresh touches the materialization only to union onto it —
  * never re-joins the old sides with each other. The two delta joins
  * are Δ-probe-sided: a small delta broadcasts (AQE), and against a
  * key-bucketed Layout side the probe prunes to the delta's buckets.
  * Multiset semantics throughout (UNION ALL): duplicate source rows
  * yield exactly the multiplicities the full re-join would.
  * Append-only, like [[IncrementalAgg]]: deletions need counted rows
  * (attach a multiplicity column and subtract) — route them through
  * a rebuild. */
object IncrementalJoin {

  /** Materialize the view: inner equi-join, key columns first. */
  def joinState(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.join(b, keys)

  /** Fold append deltas into the materialization:
    * `refreshJoin(joinState(A,B), A, B, ΔA, ΔB) ≡
    *  joinState(A∪ΔA, B∪ΔB)` exactly (row multiset equality).
    * Pass an empty delta frame (same schema) for a side that didn't
    * change — its two joins prune to nothing. */
  def refreshJoin(m: DataFrame, aOld: DataFrame, bOld: DataFrame,
                  dA: DataFrame, dB: DataFrame,
                  keys: Seq[String]): DataFrame = {
    val bNew = bOld.unionByName(dB)
    m.unionByName(joinState(dA, bNew, keys))
      .unionByName(joinState(aOld, dB, keys))
  }
}
