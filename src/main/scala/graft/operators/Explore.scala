package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Graft
import graft.model.{Metric, NearVector}

/**
 * Explore: kNN across *all* collections at once, returning (class, id,
 * distance) beacons (reference: usecases/traverser/traverser_explore_concepts.go:23,
 * db/search.go:231-295). Spark shape: per-collection distance scan + TopK,
 * unionByName, re-sort — each leg stays embarrassingly parallel and only k
 * rows per collection reach the final merge.
 */
object Explore {

  /** limit 0 → the reference's default 20 (traverser_explore_concepts.go:27);
   * certainty is cosine-only across ALL probed classes
   * (traverser_validate_distance_metrics.go:92-104) and converts to the
   * distance threshold 2·(1−certainty); offset/limit paginate the merged
   * cross-class ranking (ExploreParams.Offset/Limit). */
  def apply(g: Graft, collections: Seq[String], vector: Array[Float],
            metric: Metric, limit: Int = 0, offset: Int = 0,
            certainty: Option[Double] = None,
            distance: Option[Double] = None): DataFrame = {
    // cross-class distance compatibility (traverser_validate_distance_
    // metrics.go:40-88): every probed class must be CONFIGURED with the
    // same metric — Explore merges one distance-ranked list, and mixed
    // metrics would rank incomparable numbers. Error text verbatim
    // (crossClassDistCompatError:130-138), classes in registry order.
    val configured: Seq[(String, Metric)] = collections.map { name =>
      val s = g.collection(name).schema
      val key = s.defaultVector.orElse(s.vectors.keys.toSeq.sorted.headOption)
      name -> key.flatMap(s.vectorMetrics.get).getOrElse(Metric.Cosine)
    }
    if (configured.map(_._2).distinct.size > 1)
      throw new IllegalArgumentException(
        "vector search across classes not possible: found different distance metrics:" +
          configured.map { case (n, m) => s" class '$n' uses distance metric '${m.name}'" }
            .mkString(","))
    val sharedMetric = configured.headOption.map(_._2).getOrElse(Metric.Cosine)
    if (!(certainty.isEmpty || sharedMetric == Metric.Cosine))
      throw new IllegalArgumentException(
        s"can't compute and return certainty when vector index is configured " +
        s"with ${sharedMetric.name} distance")
    val lim = if (limit == 0) 20 else limit
    // each leg fetches offset+lim so the merged page is reachable after the
    // cross-class re-rank (the reference's searcher applies pagination to the
    // merged result list, search.go:231-295)
    val fetch = offset + lim
    val legs = collections.map { name =>
      val c = g.collection(name)
      // per-leg planner: a collection with a registered ANN index probes it
      // (same searchOrScan as Get/hybrid); the rest scan exactly
      val idx = c.schema.defaultVector.flatMap(c.vectorIndexes.get)
      graft.ann.IvfIndex.searchOrScan(c, idx, NearVector(vector, metric), Some(fetch), None)
        .select(
          lit(name).as("class_name"),
          col(c.schema.idColumn).cast("string").as("beacon_id"),
          col(VectorSearch.DistanceCol).as("distance"))
    }
    val merged = legs.reduce(_ unionByName _)
    // radius cut: certainty (cosine-only, converted) AND/OR an explicit
    // distance threshold (ExploreParams carries both; either bounds the page)
    val cut0 = certainty match {
      case Some(ct) => merged.filter(col("distance") <= lit(2.0 * (1.0 - ct)))
      case None     => merged
    }
    val cut = distance match {
      case Some(d) => cut0.filter(col("distance") <= lit(d))
      case None    => cut0
    }
    val ranked = cut
      .orderBy(col("distance").asc, col("class_name").asc, col("beacon_id").asc)
    if (offset > 0) ranked.offset(offset).limit(lim) else ranked.limit(lim)
  }
}
