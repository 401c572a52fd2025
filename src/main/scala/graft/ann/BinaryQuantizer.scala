package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.{SignPack, VectorFunctions}
import graft.model.Metric
import graft.operators.VectorSearch

/**
 * Binary quantization: 1-bit-per-dimension codes + hamming first pass +
 * exact rescore (reference: the flat index's BQ path —
 * adapters/repos/db/vector/flat/index.go `bq` branch,
 * compressionhelpers/binary_quantization.go, config
 * entities/vectorindex/flat/config.go). Training-free, unlike PQ: the code
 * is the sign pattern, so encoding is a single codegen'd projection and the
 * "codebook" never drifts as data is appended — which is why the reference
 * defaults its flat index to BQ for large collections.
 *
 * Search shape at 100 TB: the first pass scans ONLY the packed code column
 * (32× smaller than the float vectors — a ~3 TB scan instead of 100 TB),
 * computes XOR-popcount hamming inside WholeStageCodegen, and TopK keeps
 * `topK × rescoreFactor` candidates per partition
 * (TakeOrderedAndProject — only that many rows per partition cross the
 * shuffle). Exact distances then re-rank just the candidate set, matching
 * the reference's rescore-on-full-vectors step (flat/index.go rescore
 * limit).
 */
object BinaryQuantizer {

  /** Codegen'd encoder column: array<float> → array<long> sign code. */
  def encode(vecCol: Column): Column = VectorFunctions.signPack(vecCol)

  /** Driver-side encoder for query vectors (same bit layout as `encode`). */
  def encodeQuery(v: Array[Float]): Array[Long] = SignPack.pack(v)

  /**
   * BQ first pass over `encoded` (must carry idCol, the packed code column,
   * and the original vector column for rescore), exact top-k after rescore.
   * Ties on hamming break by id ascending, so the candidate set is
   * deterministic; final ranking ties likewise.
   */
  def search(encoded: DataFrame, idCol: String, codeCol: String, vecCol: String,
             query: Array[Float], topK: Int, rescoreFactor: Int = 4,
             metric: Metric = Metric.L2Squared): DataFrame = {
    val qCode = encodeQuery(query)
    val candidates = encoded
      .withColumn("__bqh", VectorFunctions.bitHamming(col(codeCol), typedLit(qCode.toSeq)))
      .orderBy(col("__bqh").asc, col(idCol).asc)
      .limit(topK * rescoreFactor)
    VectorSearch.withDistance(candidates, vecCol, query, metric)
      .orderBy(col(VectorSearch.DistanceCol).asc, col(idCol).asc)
      .limit(topK)
      .drop("__bqh")
  }
}
