package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorFunctions
import graft.model.Metric

/**
 * k-nearest-neighbour join: for each probe row, the k nearest data rows by
 * vector distance. Foundation for kNN classification (reference:
 * usecases/classification/classifier.go:229-300) and similarity-search
 * pipelines.
 *
 * Scale shape: probes broadcast (they are the small side by construction);
 * distances evaluate as a codegen'd expression inside the scan task; per-probe
 * TopK is a window over (probe, dist) — the only shuffle is on probe_id, and
 * only candidate rows that survive `range` pruning (when a threshold is given)
 * enter it. For probe sets too large to broadcast, the IVF path
 * (graft.ann.IvfIndex) bounds the candidate space first.
 */
object KnnJoin {

  def apply(
      data: DataFrame, dataId: Column, dataVec: Column,
      probes: DataFrame, probeId: Column, probeVec: Column,
      k: Int, metric: Metric, excludeSelf: Boolean = true,
      maxDistance: Option[Double] = None): DataFrame = {
    val d = data.select(dataId.as("data_id"), dataVec.as("__dv"))
    val p = probes.select(probeId.as("probe_id"), probeVec.as("__pv"))
    val joined = d.crossJoin(broadcast(p))
      .filter(if (excludeSelf) col("data_id") =!= col("probe_id") else lit(true))
      .withColumn("dist", VectorFunctions.distance(metric)(col("__dv"), col("__pv")))
    val cut = maxDistance.map(t => joined.filter(col("dist") <= t)).getOrElse(joined)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("dist").asc, col("data_id").asc)
    cut.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("data_id"), col("dist"))
  }
}
