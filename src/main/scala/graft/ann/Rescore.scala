package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions

import graft.model.Metric
import graft.operators.VectorSearch

/**
 * Shared phase 2 of every two-phase compressed search (PQ / BQ / SQ / RQ /
 * Muvera — the reference's rescore-on-full-vectors step, flat/index.go): the
 * bounded phase-1 candidate ids broadcast-left-semi-join back onto the
 * encoded table (no driver collect round-trip — the candidate set never
 * bottlenecks on the driver) and the EXACT distance ranks the survivors,
 * ties to the smaller id. One definition keeps the broadcast hint and the
 * tie-break rule in a single place instead of five hand-synced copies.
 */
object Rescore {

  def exact(encoded: DataFrame, idCol: String, candidateIds: DataFrame,
            distance: Column, topK: Int): DataFrame =
    encoded.join(broadcast(candidateIds), Seq(idCol), "left_semi")
      .withColumn(VectorSearch.DistanceCol, distance)
      .orderBy(col(VectorSearch.DistanceCol).asc, col(idCol).asc)
      .limit(topK)

  /** The single-vector form: exact `metric` distance of `vecCol` vs `query`. */
  def exactVector(encoded: DataFrame, idCol: String, candidateIds: DataFrame,
                  vecCol: String, query: Array[Float], metric: Metric,
                  topK: Int): DataFrame =
    exact(encoded, idCol, candidateIds,
      VectorFunctions.distance(metric)(col(vecCol), lit(query).cast("array<float>")), topK)
}
