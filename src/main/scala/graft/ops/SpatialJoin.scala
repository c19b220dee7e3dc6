package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance self-join over 2-D points — all pairs within `radius` —
  * equi-ized through a grid: cell side = radius, so any qualifying
  * pair sits in the same or an adjacent cell. One side keeps its home
  * cell; the other replicates to its 3×3 neighborhood (constant 9×);
  * the join is then a plain equi-join on the cell key with the exact
  * distance predicate re-applied. Never a cartesian: shuffle volume
  * is ~10× the input regardless of n, and the join key is spatial so
  * co-located points land in one partition. A dense hotspot cell is
  * ordinary join skew — AQE skew-split or [[Skew]] salting applies
  * unchanged. Each unordered pair surfaces exactly once: it is found
  * only through the lower-id point's home cell (the mirror match
  * fails the id ordering).
  */
object SpatialJoin {

  /** @return (id1, id2, dist) with id1 < id2, dist ≤ radius */
  def distanceJoin(points: DataFrame, idCol: String, xCol: String,
                   yCol: String, radius: Double): DataFrame = {
    require(radius > 0)
    val p = points.select(col(idCol).as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val home = p
      .withColumn("cx", floor(col("x") / radius))
      .withColumn("cy", floor(col("y") / radius))
    val shifted = home
      .withColumn("dx", explode(array((-1 to 1).map(lit): _*)))
      .withColumn("dy", explode(array((-1 to 1).map(lit): _*)))
      .select(col("id").as("id2"), col("x").as("x2"), col("y").as("y2"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val d2 = (col("x") - col("x2")) * (col("x") - col("x2")) +
      (col("y") - col("y2")) * (col("y") - col("y2"))
    home.join(shifted, Seq("cx", "cy"))
      .filter(col("id") < col("id2") && d2 <= lit(radius * radius))
      .select(col("id").as("id1"), col("id2"),
        round(sqrt(d2), 6).as("dist"))
  }
}
