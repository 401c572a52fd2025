package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorFunctions
import graft.model.Metric
import graft.operators.VectorSearch

/**
 * MUVERA fixed-dimensional encoding for multi-vector (ColBERT) search
 * (reference: adapters/repos/db/vector/multivector/muvera.go; the FDE
 * construction of Dhulipala et al., "MUVERA: Multi-Vector Retrieval via
 * Fixed Dimensional Encodings").
 *
 * The token bag `[[t_1..t_n]]` maps to ONE fixed-dim vector such that
 * `dot(encodeQuery(q), encodeDoc(d)) ≈ MaxSim(q, d)`. Multi-vector search
 * then becomes a cheap single-vector dot-product scan (codegen'd, the same
 * TakeOrderedAndProject shape as nearVector) over the encoded column,
 * followed by exact MaxSim rescoring of the top candidates — without the
 * encoding, every row pays the full token×token MaxSim kernel.
 *
 * Construction per repetition (muvera.go:114-199):
 *  - each token is SimHash-bucketed into 2^ksim clusters by the sign pattern
 *    of `ksim` gaussian projections (muvera.go:97-112);
 *  - cluster sums of token vectors; DOC side averages per cluster and fills
 *    empty clusters with the token nearest in hamming distance to the
 *    cluster id (muvera.go:135-162), QUERY side keeps sums;
 *  - each cluster block is randomly projected from `dim` to `dproj` dims with a
 *    ±1 matrix scaled 1/sqrt(dproj) (muvera.go:165-192).
 * Output dim = reps × 2^ksim × dproj.
 */
final case class MuveraEncoder(ksim: Int, dproj: Int, reps: Int, dim: Int, seed: Long = 42L) {
  val numClusters: Int = 1 << ksim
  /** Encoded dimensionality. */
  val outDim: Int = reps * numClusters * dproj

  // deterministic gaussians[rep][ksim][dim] and ±1 projection S[rep][dproj][dim]
  // (muvera.go:64-95 — gaussian simhash planes, rand ±1 projection matrix)
  private val (gaussians, projections) = {
    val rnd = new scala.util.Random(seed)
    val g = Array.fill(reps, ksim, dim)(rnd.nextGaussian().toFloat)
    val s = Array.fill(reps, dproj, dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    (g, s)
  }

  private def simHash(token: Array[Float], rep: Int): Int = {
    var cluster = 0
    var i = 0
    while (i < ksim) {
      val plane = gaussians(rep)(i)
      var dot = 0.0; var j = 0
      while (j < dim) { dot += plane(j) * token(j); j += 1 }
      if (dot < 0) cluster |= 1 << i
      i += 1
    }
    cluster
  }

  private def encode(tokens: Array[Array[Float]], isDoc: Boolean): Array[Float] = {
    val out = new Array[Float](outDim)
    val tmp = new Array[Float](numClusters * dim)
    val scale = (1.0 / math.sqrt(dproj.toDouble)).toFloat
    var rep = 0
    while (rep < reps) {
      java.util.Arrays.fill(tmp, 0.0f)
      val counts = new Array[Int](numClusters)
      val mapping = new Array[Int](tokens.length)
      var t = 0
      while (t < tokens.length) {
        val cl = simHash(tokens(t), rep)
        mapping(t) = cl; counts(cl) += 1
        val start = cl * dim
        var i = 0
        while (i < dim) { tmp(start + i) += tokens(t)(i); i += 1 }
        t += 1
      }
      if (isDoc) {
        // per-cluster average (muvera.go:136-141)
        var cl = 0
        while (cl < numClusters) {
          if (counts(cl) > 0) {
            val inv = 1.0f / counts(cl); val start = cl * dim
            var i = 0
            while (i < dim) { tmp(start + i) *= inv; i += 1 }
          }
          cl += 1
        }
        // fill empty clusters with the hamming-nearest token (muvera.go:142-162)
        cl = 0
        while (cl < numClusters) {
          if (counts(cl) == 0 && tokens.nonEmpty) {
            var best = 0; var bestHam = Integer.MAX_VALUE
            var ti = 0
            while (ti < tokens.length) {
              val ham = Integer.bitCount(cl ^ mapping(ti))
              if (ham < bestHam) { bestHam = ham; best = ti }
              ti += 1
            }
            val start = cl * dim
            var i = 0
            while (i < dim) { tmp(start + i) = tokens(best)(i); i += 1 }
          }
          cl += 1
        }
      }
      // random ±1 projection per cluster block (muvera.go:165-192)
      val repOffset = rep * numClusters * dproj
      var cl = 0
      while (cl < numClusters) {
        val srcStart = cl * dim
        val dstStart = repOffset + cl * dproj
        var k = 0
        while (k < dproj) {
          val row = projections(rep)(k)
          var sum = 0.0f; var i = 0
          while (i < dim) { sum += row(i) * tmp(srcStart + i); i += 1 }
          out(dstStart + k) = sum * scale
          k += 1
        }
        cl += 1
      }
      rep += 1
    }
    out
  }

  def encodeQuery(query: Array[Array[Float]]): Array[Float] = encode(query, isDoc = false)
  def encodeDoc(doc: Array[Array[Float]]): Array[Float] = encode(doc, isDoc = true)

  /** Column encoder for the offline doc-side batch pass (one scan; the UDF is
   * acceptable off the query path — the QUERY-time first pass is the
   * codegen'd dot kernel over the materialized encoded column). */
  def encodeDocCol: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (tokens: Seq[Seq[Float]]) =>
      if (tokens == null) null
      else encodeDoc(tokens.map(_.toArray).toArray).toSeq
    }
}

object Muvera {

  /** Materialize the encoded column (batch-built side artifact, like the IVF
   * assignment or PQ codes). */
  def encodeDocs(df: DataFrame, mvecCol: Column, enc: MuveraEncoder,
                 outCol: String = "__muvera"): DataFrame =
    df.withColumn(outCol, enc.encodeDocCol(mvecCol))

  /**
   * Muvera-accelerated multi-vector search: fixed-dim dot-product first pass
   * over the encoded column (Metric.Dot distance = −dot, so ascending order
   * = best MaxSim estimate first), exact MaxSim rescore of the top
   * `topK × rescoreFactor` candidates. Recall vs the exact scan is asserted
   * in MuveraSpec (≥ 0.9, the same bar as IVF/PQ).
   */
  def search(encoded: DataFrame, idCol: String, muveraCol: String, mvecCol: String,
             query: Array[Array[Float]], enc: MuveraEncoder,
             topK: Int, rescoreFactor: Int = 4): DataFrame = {
    val cands =
      firstPass(encoded, idCol, muveraCol, enc.encodeQuery(query), topK * rescoreFactor)
        .select(col(idCol))
    val qLit = typedLit(query.map(_.toSeq).toSeq)
    Rescore.exact(encoded, idCol, cands,
        VectorFunctions.maxSim(qLit, col(mvecCol)), topK)
      .drop(muveraCol)
  }

  /** Phase-1 frame: encoded-dot ranking over (id, encoding) ONLY — two-phase
   * like BinaryQuantizer.search, so with a parquet-backed encoded table the
   * first pass scans just the two columns (never the token bags) and the
   * bounded candidate frame broadcast-left-semi-joins into the exact MaxSim
   * rescore fetch (no driver collect round-trip). Exposed for plan asserts. */
  private[graft] def firstPass(encoded: DataFrame, idCol: String, muveraCol: String,
                               qEnc: Array[Float], n: Int): DataFrame =
    encoded.select(col(idCol), col(muveraCol))
      .withColumn("__mdist",
        VectorFunctions.distance(Metric.Dot)(col(muveraCol), lit(qEnc).cast("array<float>")))
      .orderBy(col("__mdist").asc, col(idCol).asc)
      .limit(n)
}
