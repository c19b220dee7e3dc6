package graft.api

import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.pipeline.Similarity

/** Analytics extensions beyond the reference's own surface (SURVEY
  * §2.4 notes GROUPING SETS / percentiles are absent there — an
  * engine replacing it should still have them). */
object AnalyticsQueries {

  val entries: Seq[Q] = Seq(

    Q("a9_percentiles",
      // exact interpolated percentiles per group (Spark `percentile`
      // ≡ DuckDB quantile_cont)
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.95)), 6).as("p95"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
        "round(quantile_cont(value, 0.95), 6) AS p95, count(*) AS n " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    Q("a12_quantile_sketch",
      // single-pass MERGEABLE quantiles via the custom GK sketch
      // aggregate — the percentile path that survives 100 TB groups
      // (bounded O((1/ε)·log εn) state, map-side partial merge) where
      // a9's exact per-group sort cannot. The gate runs the sketch in
      // its exact-at-capacity regime (n ≤ 1/ε ⟹ every value retained,
      // query = exact rank-⌈qn⌉ element, deterministic under any merge
      // order), so the explicit rank-selection SQL is a true oracle;
      // the ε-bound beyond capacity is pinned by QuantileSketchSpec.
      (s, dir) => {
        import graft.functions.QuantileSketchAgg.quantile_sketch
        Tables.load(s, dir, "events")
          .filter(pmod(col("event_id"), lit(20)) === 0)
          .groupBy(col("event_type"))
          .agg(quantile_sketch(col("value"), Seq(0.25, 0.5, 0.9), 1e-4)
            .as("qs"), count(lit(1)).as("n"))
          // no rounding: the sketch returns exact stored values, and the
          // oracle selects the SAME parquet doubles — bit-identical
          .select(col("event_type"),
            element_at(col("qs"), 1).as("p25"),
            element_at(col("qs"), 2).as("p50"),
            element_at(col("qs"), 3).as("p90"),
            col("n"))
          .orderBy("event_type")
      },
      Some("WITH o AS (SELECT event_type, value FROM events " +
        "WHERE event_id % 20 = 0), " +
        "r AS (SELECT event_type, value, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk, " +
        "count(*) OVER (PARTITION BY event_type) AS n FROM o) " +
        "SELECT event_type, " +
        "max(CASE WHEN rk = GREATEST(1, CAST(ceil(0.25 * n) AS BIGINT)) " +
        "THEN value END) AS p25, " +
        "max(CASE WHEN rk = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT)) " +
        "THEN value END) AS p50, " +
        "max(CASE WHEN rk = GREATEST(1, CAST(ceil(0.9 * n) AS BIGINT)) " +
        "THEN value END) AS p90, max(n) AS n " +
        "FROM r GROUP BY event_type ORDER BY event_type")),

    Q("a10_rollup",
      // ROLLUP hierarchy totals; grouping-null keys coalesced to a
      // marker so cross-engine null ordering never matters
      (s, dir) => Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_price"), col("n"))
        .orderBy("rf", "ls"),
      Some("SELECT coalesce(l_returnflag, 'ALL') AS rf, " +
        "coalesce(l_linestatus, 'ALL') AS ls, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, " +
        "count(*) AS n FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY rf, ls")),

    Q("e4_centroids",
      // per-label mean embedding (class centroids) — elementwise
      // array aggregation via posexplode, flat output shape
      (s, dir) => Tables.load(s, dir, "embeddings")
        .select(col("label"),
          posexplode(Similarity.vecD(col("embedding"))).as(Seq("pos", "v")))
        .groupBy(col("label"), (col("pos") + 1).as("dim"))
        .agg(round(avg(col("v")), 6).as("centroid_v"), count(lit(1)).as("n_vecs"))
        .orderBy("label", "dim"),
      Some("SELECT label, dim, round(avg(v), 6) AS centroid_v, count(*) AS n_vecs " +
        "FROM (SELECT label, generate_subscripts(embedding, 1) AS dim, " +
        "unnest(CAST(embedding AS DOUBLE[])) AS v FROM embeddings) " +
        "GROUP BY label, dim ORDER BY label, dim")),
  )
}
