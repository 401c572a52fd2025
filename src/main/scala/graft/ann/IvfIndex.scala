package graft.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorFunctions
import graft.engine.Collection
import graft.model.{Metric, NearVector}
import graft.operators.VectorSearch

/**
 * IVF (inverted-file) vector index: a batch-built side table replacing the
 * reference's online HNSW graph (SURVEY §4 — "index acceleration is a
 * batch-built side table + planner choice"; north star: "batch vector index
 * build via MLlib").
 *
 * Build: MLlib KMeans learns `nlist` coarse centroids (the quantizer —
 * analogous to the PQ codebook training in the reference's
 * compressionhelpers); every row is assigned its nearest centroid once, and
 * the assignment is persisted *partitioned by centroid id*.
 *
 * Search: the query ranks centroids driver-side (nlist is tiny), then scans
 * only the `nprobe` best partitions — at 100 TB this is partition pruning on
 * the parquet layout: reading nprobe/nlist of the data instead of all of it.
 * Exact distance + TopK inside the probed subset gives the usual IVF recall
 * (tunable via nprobe; recall ≥ 0.9 asserted in AnnSpec mirroring the
 * reference's compress_recall_test.go:144).
 */
final case class IvfIndex(
    centroids: Array[(Int, Array[Double])],
    assigned: DataFrame, // original columns + __centroid
    vecCol: String,
    idCol: String) {

  /** Rank centroids by distance to the query (driver-side, nlist entries). */
  def rankCentroids(query: Array[Float]): Array[Int] = {
    val q = query.map(_.toDouble)
    centroids.map { case (cid, c) =>
      var d = 0.0; var i = 0
      while (i < q.length) { val t = c(i) - q(i); d += t * t; i += 1 }
      (cid, d)
    }.sortBy(_._2).map(_._1)
  }

  /** IVF search: probe the nprobe nearest centroid partitions, exact top-k. */
  def search(query: Array[Float], k: Int, metric: Metric, nprobe: Int): DataFrame = {
    val probes = rankCentroids(query).take(nprobe).toSeq
    val subset = assigned.filter(col("__centroid").isin(probes: _*))
    VectorSearch.withDistance(subset, vecCol, query, metric)
      .orderBy(col(VectorSearch.DistanceCol).asc, col(idCol).asc)
      .limit(k)
      .drop("__centroid")
  }
}

object IvfIndex {

  /** Train the coarse quantizer and assign every row to a centroid. */
  def build(df: DataFrame, idCol: String, vecCol: String,
            nlist: Int, seed: Long = 42L): IvfIndex = {
    val spark = df.sparkSession
    import spark.implicits._
    val toMl = udf((v: Seq[Float]) => Vectors.dense(v.map(_.toDouble).toArray))
    val withFeatures = df.withColumn("__features", toMl(col(vecCol)))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("__features").setPredictionCol("__centroid")
      .fit(withFeatures)
    val assigned = model.transform(withFeatures).drop("__features")
      // 100 TB layout: persist partitioned by __centroid so probing nprobe
      // lists is partition pruning, not a full scan
      .repartition(col("__centroid"))
    val cents = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    IvfIndex(cents, assigned, vecCol, idCol)
  }

  /**
   * Planner choice (the analogue of the reference's flatSearchCutoff/ACORN
   * decision, entities/vectorindex/hnsw/config.go:34-39): brute-force the
   * filtered set when a `where` filter keeps it small; otherwise probe the
   * index. `filteredCountHint` plays the role of the allowlist cardinality.
   */
  def searchOrScan(c: Collection, index: Option[IvfIndex], params: NearVector,
                   k: Int, nprobe: Int, filtered: Option[DataFrame],
                   filteredCountHint: Option[Long] = None,
                   flatSearchCutoff: Long = 40000L): DataFrame = {
    val useIndex = index.isDefined && filtered.isEmpty &&
      filteredCountHint.forall(_ >= flatSearchCutoff)
    if (useIndex) index.get.search(params.vector, k, params.metric, nprobe)
    else VectorSearch.nearVector(c, params, params.metric, Some(k), filtered)
  }
}
