package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Kernels

/** IVF (inverted-file) approximate nearest neighbor: k-means coarse
  * quantizer over the corpus, per-cell inverted lists, query probes
  * only the `nProbe` nearest cells — the classic
  * FAISS-IVF-Flat structure expressed as DataFrames.
  *
  * Scale shape: training samples the corpus (k-means on a bounded
  * sample), assignment is one broadcast-join-free pass (centroid
  * array is a literal), and a query touches ~nProbe/nCells of the
  * corpus. The cell column is the natural partition key for the
  * stored index.
  */
class IvfIndex private (val cells: DataFrame, centroids: Array[Array[Double]],
                        id: String) {

  private def centroidLit: Column =
    typedlit(centroids.map(_.toSeq).toSeq)

  /** Cosine top-k for each query vector, probing `nProbe` cells. */
  def topK(queries: DataFrame, vec: String, k: Int, nProbe: Int): DataFrame = {
    val q = Kernels.ensureParallelism(
      queries.select(col(id).as("query_id"), Similarity.vecD(col(vec)).as("qv")))
    // rank centroids per query, keep nProbe nearest (by cosine)
    val probed = q.withColumn("cell",
        explode(IvfIndex.nearestCells(col("qv"), centroidLit, nProbe)))
    val c = cells.select(col(id).as("neighbor_id"), col("cell"), col("cv"))
    val cand = broadcast(probed).join(c, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("cos"))
      .dropDuplicates("query_id", "neighbor_id")
    Kernels.topKPerKey(cand, Seq("query_id"),
        Seq(col("cos"), -col("neighbor_id")), k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
  }
}

object IvfIndex {

  /** Build the index: k-means (fixed seed) on the corpus, then assign
    * every vector to its nearest centroid cell. */
  def build(corpus: DataFrame, id: String, vec: String,
            nCells: Int, seed: Long = 42L): IvfIndex = {
    val base = Kernels.ensureParallelism(
        corpus.select(col(id), Similarity.vecD(col(vec)).as("cv")))
      .persist()
    val feats = base.withColumn("features", array_to_vector(col("cv")))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("features")
      .fit(feats)
    val centroids = model.clusterCenters.map(_.toArray)
    val assigned = model.transform(feats)
      .withColumnRenamed("prediction", "cell")
      .select(col(id), col("cell"), col("cv"))
      .persist()
    new IvfIndex(assigned, centroids, id)
  }

  /** Indices (cells) of the `nProbe` nearest centroids by cosine —
    * computed as a sort over the literal centroid array. */
  private[pipeline] def nearestCells(qv: Column, centroids: Column,
                                     nProbe: Int): Column = {
    // pair each centroid with its index, rank by cosine to the query
    val scored = transform(centroids,
      (c, i) => struct(graft.functions.VectorExprs.cosine_sim(qv, c).as("cos"),
        i.as("cell")))
    slice(reverse(array_sort(scored)), 1, nProbe).getField("cell")
  }
}
