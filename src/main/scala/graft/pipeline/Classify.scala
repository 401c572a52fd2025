package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.IvfIndex
import graft.model.Metric
import graft.operators.KnnJoin

/**
 * kNN classification as a batch job (reference: usecases/classification/
 * classifier.go:229-300, adapters/repos/db/classification.go:33-120): assign
 * each unlabeled object the majority label among its k nearest labeled
 * neighbours; ties break to the smallest label (the reference's winner pick is
 * map-iteration-unordered — we pin a total order for reproducibility).
 */
object Classify {

  /** @return (probe_id, predicted_label, votes) one row per probe.
   * With `index` (an IvfIndex over the labeled set's vector column) the
   * neighbour search is the IVF-bucketed join — the scale path; without it,
   * brute force (correct for small probe sets only). */
  def knn(
      labeled: DataFrame, labeledId: Column, labeledVec: Column, labelCol: Column,
      probes: DataFrame, probeId: Column, probeVec: Column,
      k: Int, metric: Metric = Metric.L2Squared,
      index: Option[IvfIndex] = None, nprobe: Option[Int] = None): DataFrame = {
    val neighbours = index match {
      case Some(ix) =>
        // the index must be built over THIS labeled frame's id/vector columns
        // — an index over a different frame would silently drop neighbours at
        // the label join below (fewer than k votes, no error)
        require(ix.idCol == labeledId.toString && ix.vecCol == labeledVec.toString,
          s"index columns (${ix.idCol}, ${ix.vecCol}) do not match the labeled " +
          s"frame's ($labeledId, $labeledVec) — build the IvfIndex over `labeled`")
        KnnJoin.bucketed(ix, probes, probeId, probeVec, k, metric,
          nprobe.getOrElse(ix.defaultNprobe))
      case None => KnnJoin(labeled, labeledId, labeledVec,
        probes, probeId, probeVec, k, metric)
    }
    val withLabels = neighbours.join(
      labeled.select(labeledId.as("data_id"), labelCol.as("label")), Seq("data_id"))
    val votes = withLabels.groupBy(col("probe_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("votes").desc, col("label").asc)
    votes.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("probe_id"), col("label").as("predicted_label"), col("votes"))
  }

  /**
   * Zero-shot classification (reference: usecases/classification/
   * classifier_run.go zeroshot path — each unlabeled object gets the label of
   * its single nearest neighbour among the label-source objects, whose vectors
   * come from vectorizing the label names; no training data).
   *
   * Scale shape: the label set is bounded by the number of classes, so the
   * candidates are collected driver-side and the argmin is ONE codegen'd
   * `least()` over per-label distance structs — a pure map-side projection
   * over the 100 TB data frame, no join, no shuffle, no window. Ties break
   * (distance, label) ascending for reproducibility.
   *
   * @return (probe_id, predicted_label, dist) one row per data row.
   */
  def zeroShot(
      data: DataFrame, dataId: Column, dataVec: Column,
      labels: DataFrame, labelCol: Column, labelVec: Column,
      metric: Metric = Metric.Cosine, maxLabels: Int = 1024): DataFrame = {
    import org.apache.spark.sql.graft.VectorFunctions
    val labelRows = labels.select(labelCol.cast("string"), labelVec).collect()
    require(labelRows.nonEmpty, "zeroShot: empty label set")
    require(labelRows.length <= maxLabels,
      s"zeroShot: ${labelRows.length} labels exceed maxLabels=$maxLabels — " +
      "zero-shot label sets are class-name-sized; use knn for example-labeled data")
    val candidates = labelRows.toSeq.map { r =>
      val vec = typedLit(r.getSeq[Float](1).toArray)
      struct(
        VectorFunctions.distance(metric)(dataVec, vec).as("dist"),
        lit(r.getString(0)).as("label"))
    }
    val best = if (candidates.size == 1) candidates.head else least(candidates: _*)
    data.select(
      dataId.as("probe_id"),
      best.getField("label").as("predicted_label"),
      best.getField("dist").as("dist"))
  }
}
