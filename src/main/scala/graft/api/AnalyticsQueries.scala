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
