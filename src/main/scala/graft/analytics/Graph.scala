package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over normalized undirected edge lists
  * (the [[graft.ops.Kernels.normalizeEdge]] shape the reference's
  * friend graph uses) — the ranking complement to
  * [[graft.pipeline.Dedup.dupClusters]]' connectivity pass.
  */
object Graph {

  /** PageRank with a FIXED iteration count (Brin–Page 1998, damping
    * `d`): pr₀ = 1/N, then
    *
    *   prₖ₊₁(v) = (1−d)/N + d · Σ_{u∈adj(v)} prₖ(u)/deg(u)
    *
    * Undirected edges are expanded to both directed adjacencies, so
    * every node has deg ≥ 1 and there is no dangling-mass term.
    *
    * Scale shape: each iteration is ONE equi-join from the adjacency
    * list to the current rank vector plus one hash aggregation —
    * never a collect, never a cartesian; the rank vector is
    * checkpoint-light (nodes × 16 bytes). Iterations are a fixed
    * small constant (ranking stabilizes long before convergence in
    * practice); for convergence-driven runs add the
    * [[graft.pipeline.Dedup]] localCheckpoint-per-round discipline to
    * keep the plan from growing linearly.
    */
  def pageRank(edges: DataFrame, u1: String, u2: String,
               iters: Int = 3, d: Double = 0.85): DataFrame = {
    require(iters >= 0, "pageRank: iters must be >= 0")
    val adj = edges.select(col(u1).as("src"), col(u2).as("dst"))
      .union(edges.select(col(u2).as("src"), col(u1).as("dst")))
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val nodes = adj.select(col("src").as("node")).distinct()
    val n = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var pr = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = adj
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .join(deg, "src")
        .groupBy(col("dst")).agg(sum(col("pr") / col("__deg")).as("__in"))
      pr = nodes.crossJoin(broadcast(n))
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          ((lit(1.0) - lit(d)) / col("__n") +
            lit(d) * coalesce(col("__in"), lit(0.0))).as("pr"))
    }
    pr
  }
}
