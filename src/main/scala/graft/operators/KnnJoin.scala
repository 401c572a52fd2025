package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorFunctions
import graft.ann.IvfIndex
import graft.model.Metric

/**
 * k-nearest-neighbour join: for each probe row, the k nearest data rows by
 * vector distance. Foundation for kNN classification (reference:
 * usecases/classification/classifier.go:229-300) and similarity-search
 * pipelines.
 *
 * Two physical strategies:
 *  - `apply` (brute force): probes broadcast against a full data scan —
 *    O(N × P) distance evaluations. Exact; right only for small probe sets.
 *  - `bucketed` (IVF): probes and data share the index's coarse centroids, the
 *    join is an equi-join on `__centroid`, so each probe only meets the data
 *    rows in its `nprobe` nearest posting lists — O(Σ_c |data_c| × |probes_c|),
 *    a nprobe/nlist fraction of the brute-force work, and with a persisted
 *    index the data side is parquet-partition-pruned. This is the similarity-
 *    join shape that survives 100 TB. Exact when nprobe = nlist; recall vs
 *    nprobe asserted in KnnJoinSpec (mirroring AnnSpec's IVF recall bar).
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
    topK(joined, k, maxDistance)
  }

  /**
   * IVF-bucketed kNN join: each probe is replicated to its `nprobe` nearest
   * centroids (driver-broadcast centroid table, codegen-adjacent UDF), then
   * equi-joined with the index's centroid-assigned data. The candidate set per
   * probe is exactly the union of its probed posting lists — the same
   * candidate space IvfIndex.search scans for a single query, vectorized
   * across the whole probe relation.
   *
   * Physical strategy for the join itself, decided by probe-relation size
   * (`broadcastProbes` = None → Catalyst's stats estimate vs the 64 MB
   * broadcast budget):
   *  - SMALL probe set (classification queries): probes (replicated ×nprobe)
   *    broadcast — keeps the big data side shuffle-free; a plain hash join
   *    keyed on nlist distinct centroids would funnel 100 TB into nlist
   *    partitions.
   *  - LARGE probe set (pipeline-scale, e.g. corpus self-join semantic
   *    dedup where probes == data): a salted shuffle hash join — the data
   *    side is salted `hash(id) % saltBuckets` and probes are replicated to
   *    every salt, so the join key space is nlist × saltBuckets and no
   *    executor must hold the probe relation in memory (the previous
   *    broadcast-only shape OOM'd exactly here).
   * Overlapping replicas (index.replicas > 1 and/or nprobe > 1) can surface
   * a (probe, data) pair from several lists; pairs dedupe before ranking.
   * Quantizer note: centroid ranking is squared-L2 (the KMeans training
   * space) regardless of `metric` — exact at full probe for any metric;
   * in the pruned-nprobe regime recall is tuned for L2-like metrics
   * (normalize vectors first for cosine, as the reference does).
   */
  def bucketed(
      index: IvfIndex,
      probes: DataFrame, probeId: Column, probeVec: Column,
      k: Int, metric: Metric, nprobe: Int,
      excludeSelf: Boolean = true,
      maxDistance: Option[Double] = None,
      broadcastProbes: Option[Boolean] = None,
      saltBuckets: Int = 8): DataFrame = {
    val np = nprobe
    // centroid ids equal their position in the table (IvfIndex.build zips
    // with index); the assignment kernel is the codegen'd NearestCentroids
    // expression — no per-row boxed UDF, no driver broadcast to manage
    val centerArr: Array[Array[Double]] = index.centroids.sortBy(_._1).map(_._2)
    val p = probes.select(probeId.as("probe_id"), probeVec.as("__pv"))
      .withColumn("__centroid", explode(VectorFunctions.nearestCentroids(col("__pv"), centerArr, np)))
    val d = index.assigned.select(
      col(index.idCol).as("data_id"), col(index.vecCol).as("__dv"), col("__centroid"))
    val useBroadcast = broadcastProbes.getOrElse {
      // stats-based estimate (no job): replicated probe bytes vs 64 MB budget
      val bytes = probes.queryExecution.optimizedPlan.stats.sizeInBytes
      bytes * np <= BigInt(64L * 1024 * 1024)
    }
    val joined0 =
      if (useBroadcast) d.join(broadcast(p), Seq("__centroid"))
      else {
        val s = saltBuckets
        val dS = d.withColumn("__salt", pmod(xxhash64(col("data_id")), lit(s.toLong)))
        val pS = p.withColumn("__salt",
          explode(array((0 until s).map(i => lit(i.toLong)): _*)))
        // declare the shuffle-hash strategy: without the hint Catalyst would
        // re-broadcast a "small-looking" probe estimate — the exact failure
        // mode this path exists to avoid
        dS.join(pS.hint("shuffle_hash"), Seq("__centroid", "__salt")).drop("__salt")
      }
    val joined = joined0
      .filter(if (excludeSelf) col("data_id") =!= col("probe_id") else lit(true))
      .withColumn("dist", VectorFunctions.distance(metric)(col("__dv"), col("__pv")))
    // same pair via several probed/replicated lists → keep one (dist identical)
    val deduped =
      if (np > 1 || index.replicas > 1)
        joined.groupBy(col("probe_id"), col("data_id")).agg(min(col("dist")).as("dist"))
      else joined
    topK(deduped, k, maxDistance)
  }

  /** Range cut + per-probe bounded rank (the only shuffle keys on probe_id). */
  private def topK(pairs: DataFrame, k: Int, maxDistance: Option[Double]): DataFrame = {
    val cut = maxDistance.map(t => pairs.filter(col("dist") <= t)).getOrElse(pairs)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("dist").asc, col("data_id").asc)
    cut.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("data_id"), col("dist"))
  }
}
