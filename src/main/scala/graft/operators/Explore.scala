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

  def apply(g: Graft, collections: Seq[String], vector: Array[Float],
            metric: Metric, limit: Int): DataFrame = {
    val legs = collections.map { name =>
      val c = g.collection(name)
      // per-leg planner: a collection with a registered ANN index probes it
      // (same searchOrScan as Get/hybrid); the rest scan exactly
      val idx = c.schema.defaultVector.flatMap(c.vectorIndexes.get)
      graft.ann.IvfIndex.searchOrScan(c, idx, NearVector(vector, metric), Some(limit), None)
        .select(
          lit(name).as("class_name"),
          col(c.schema.idColumn).cast("string").as("beacon_id"),
          col(VectorSearch.DistanceCol).as("distance"))
    }
    legs.reduce(_ unionByName _)
      .orderBy(col("distance").asc, col("class_name").asc, col("beacon_id").asc)
      .limit(limit)
  }
}
