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
   * BQ search over `encoded` (must carry idCol, the packed code column, and
   * the original vector column for rescore), exact top-k after rescore.
   * Ties on hamming break by id ascending, so the candidate set is
   * deterministic; final ranking ties likewise.
   *
   * Two-phase so the first pass genuinely never touches the vectors: phase 1
   * projects ONLY (id, code) — column pruning reaches the scan, so a parquet
   * layout reads 32× fewer bytes — and TakeOrderedAndProject keeps
   * `topK × rescoreFactor` rows per partition. The bounded candidate frame
   * then broadcast-left-semi-joins back onto the table for phase 2's exact
   * distances — the candidate set stays distributed end-to-end (no driver
   * `collect` round-trip), so rescoreFactor can scale with k without a
   * driver bottleneck. This is the reference flat-index shape: hamming over
   * in-memory codes, rescore fetches full vectors by id (flat/index.go).
   */
  def search(encoded: DataFrame, idCol: String, codeCol: String, vecCol: String,
             query: Array[Float], topK: Int, rescoreFactor: Int = 4,
             metric: Metric = Metric.L2Squared): DataFrame = {
    val qCode = encodeQuery(query)
    val cands = firstPass(encoded, idCol, codeCol, qCode, topK * rescoreFactor)
      .select(col(idCol))
    Rescore.exactVector(encoded, idCol, cands, vecCol, query, metric, topK)
  }

  /** Phase-1 frame: hamming over (id, code) only — exposed for plan asserts. */
  private[graft] def firstPass(encoded: DataFrame, idCol: String, codeCol: String,
                               qCode: Array[Long], n: Int): DataFrame =
    encoded.select(col(idCol), col(codeCol))
      .withColumn("__bqh", VectorFunctions.bitHamming(col(codeCol), typedLit(qCode.toSeq)))
      .orderBy(col("__bqh").asc, col(idCol).asc)
      .limit(n)
}
