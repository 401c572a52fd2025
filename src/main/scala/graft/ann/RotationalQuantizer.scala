package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.{FastRotationSpec, RqOps, VectorFunctions}
import graft.model.Metric
import graft.operators.VectorSearch

/**
 * Rotational quantization: data-independent random rotation + per-vector
 * byte grid + compressed-domain first pass + exact rescore (reference:
 * compressionhelpers/rotational_quantization.go — NewRotationalQuantizer:58-76
 * with 3 rotation rounds; fast_rotation.go's swap/sign/FWHT structure;
 * the RQ branch sits alongside PQ/BQ/SQ in the flat and HNSW compression
 * paths). Like BQ it is completely training-free — the rotation depends only
 * on (dim, seed), never on data — so codes never drift on append and the
 * "build" is a single codegen'd projection; unlike SQ's one global grid, the
 * grid adapts per vector (lower/step in each code's 16-byte header), which
 * keeps precision when value ranges vary across vectors.
 *
 * Search shape at 100 TB mirrors BinaryQuantizer.search: first pass scans
 * ONLY the ~4×-smaller code column, computes the compressed-domain dot
 * estimate inside WholeStageCodegen, TakeOrderedAndProject bounds candidates
 * per partition, and the candidate frame broadcast-left-semi-joins back for
 * the exact rescore — no driver collect round-trip.
 */
final case class RotationalQuantizer(rotation: FastRotationSpec) {

  /** Codegen'd encoder column: array<float> → binary RQ code. */
  def encode(vecCol: Column): Column = VectorFunctions.rqEncode(vecCol, rotation)

  /** Driver-side encoder for query vectors (reference NewDistancer:271-274
   * likewise encodes the query once; the asymmetric query distance expands
   * to the same formula as the symmetric compressed-compressed one). */
  def encodeQuery(v: Array[Float]): Array[Byte] = RqOps.encode(v, rotation)

  /** Compressed-domain distance of a code column to `query`. */
  def codeDistance(codeCol: Column, query: Array[Float], metric: Metric): Column =
    VectorFunctions.rqCodeDistance(codeCol, lit(encodeQuery(query)), metric)

  /** RQ first pass over the encoded table, exact rescore of top candidates.
   * `encoded` must carry idCol, the code column, and the original vector. */
  def search(encoded: DataFrame, idCol: String, codeCol: String, vecCol: String,
             query: Array[Float], topK: Int, rescoreFactor: Int = 4,
             metric: Metric = Metric.L2Squared): DataFrame = {
    val cands = firstPass(encoded, idCol, codeCol, query, topK * rescoreFactor, metric)
      .select(col(idCol))
    Rescore.exactVector(encoded, idCol, cands, vecCol, query, metric, topK)
  }

  /** Phase-1 frame: compressed-domain ranking over (id, code) only —
   * exposed for plan asserts, mirroring BinaryQuantizer.firstPass. */
  private[graft] def firstPass(encoded: DataFrame, idCol: String, codeCol: String,
                               query: Array[Float], n: Int, metric: Metric): DataFrame =
    encoded.select(col(idCol), col(codeCol))
      .withColumn("__rqd", codeDistance(col(codeCol), query, metric))
      .orderBy(col("__rqd").asc, col(idCol).asc)
      .limit(n)
}

object RotationalQuantizer {

  /** 3 rotation rounds, the reference's quality/perf tradeoff
   * (rotational_quantization.go:59-63). */
  def apply(inputDim: Int, seed: Long = 42L): RotationalQuantizer =
    RotationalQuantizer(FastRotationSpec(inputDim, rounds = 3, seed))
}
