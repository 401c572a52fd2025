package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

import graft.model.FeatureProjectionParams

/**
 * `_additional { featureProjection }` — t-SNE dimensionality reduction over
 * the RESULT PAGE (reference: usecases/modulecomponents/additional/projector/
 * projector.go — `Reduce` runs go-tsne over the returned results' vectors;
 * defaults projector_params.go:31-39: algorithm "tsne", dimensions 2,
 * perplexity min(n-1, 5), iterations 100, learningRate 25; validation
 * projector_params.go:41-60).
 *
 * Scale note: like the reference's module, this is a DRIVER-SIDE reduction
 * of an already-bounded page (≤ the query limit) — it never touches the
 * collection. The embedding itself is the standard exact t-SNE (symmetrized
 * perplexity-calibrated affinities, early exaggeration, momentum gradient
 * descent), seeded deterministically so repeated queries project
 * identically; go-tsne's random init makes the reference's exact floats
 * unreproducible by design, so parity is behavioral (shape, determinism,
 * neighborhood preservation), not bitwise.
 */
object FeatureProjection {

  val Col = "_featureProjection"

  /**
   * Decorate a BOUNDED result page with `_featureProjection` — the page's
   * vectors reduced to `dimensions` coordinates (reference: projector.go
   * `Reduce` decorates each search result's _additional). The page is
   * collected in its result order (deterministic throughout the engine —
   * rank order with id tie-breaks), reduced driver-side like the
   * reference's module, and joined back as a broadcast k-row lookup, so
   * nothing here ever touches the collection.
   */
  def attach(results: DataFrame, idCol: String, vecCol: String,
             params: FeatureProjectionParams): DataFrame = {
    val rows = results.select(col(idCol), col(vecCol)).collect()
    val vecs = rows.map { r =>
      require(!r.isNullAt(1),
        s"featureProjection: result ${r.get(0)} has no vector in $vecCol")
      r.getSeq[Float](1).toArray
    }
    val proj = reduce(vecs, params)
    val spark = results.sparkSession
    val schema = StructType(Seq(
      results.schema(idCol).copy(name = "__fp_id"),
      StructField(Col, ArrayType(FloatType, containsNull = false))))
    val data = rows.toSeq.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), proj(i).toSeq)
    }
    val lookup = spark.createDataFrame(
      java.util.Arrays.asList(data: _*), schema)
    results.join(broadcast(lookup), results(idCol) === col("__fp_id"), "left")
      .drop("__fp_id")
  }

  /** Reference validation (projector_params.go:41-60), reference-shaped
   * messages; perplexity default min(n-1, 5). */
  private def resolve(p: FeatureProjectionParams, n: Int): (Int, Int, Int, Int) = {
    val perp = p.perplexity.getOrElse(math.min(n - 1, 5))
    require(p.algorithm == "tsne",
      s"algorithm ${p.algorithm} is not supported: must be one of: tsne")
    require(perp < n, s"perplexity must be smaller than amount of items: $perp >= $n")
    require(p.iterations >= 1, s"iterations must be at least 1, got: ${p.iterations}")
    require(p.learningRate >= 1, s"learningRate must be at least 1, got: ${p.learningRate}")
    require(p.dimensions >= 1, s"dimensions must be at least 1, got: ${p.dimensions}")
    (p.dimensions, perp, p.iterations, p.learningRate)
  }

  /** Exact t-SNE over `vectors` (n × d). Deterministic (fixed-seed init). */
  def reduce(vectors: Array[Array[Float]], params: FeatureProjectionParams): Array[Array[Float]] = {
    val n = vectors.length
    if (n == 0) return Array.empty
    val (dims, perp, iters, eta) = resolve(params, n)
    if (n == 1) return Array(Array.fill(dims)(0.0f))

    // pairwise squared distances
    val d2 = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- (i + 1) until n) {
      var s = 0.0; var k = 0
      val vi = vectors(i); val vj = vectors(j)
      while (k < vi.length) { val t = vi(k).toDouble - vj(k); s += t * t; k += 1 }
      d2(i)(j) = s; d2(j)(i) = s
    }

    // per-point sigma via binary search on entropy = log(perplexity)
    val targetH = math.log(perp.toDouble.max(1.000001))
    val pCond = Array.ofDim[Double](n, n)
    for (i <- 0 until n) {
      var beta = 1.0; var betaMin = Double.NegativeInfinity; var betaMax = Double.PositiveInfinity
      var tries = 0
      var row = new Array[Double](n)
      while (tries < 50) {
        var sum = 0.0
        var j = 0
        while (j < n) {
          row(j) = if (j == i) 0.0 else math.exp(-d2(i)(j) * beta)
          sum += row(j); j += 1
        }
        if (sum <= 0) sum = Double.MinPositiveValue
        var h = 0.0
        j = 0
        while (j < n) {
          if (row(j) > 0) { val pj = row(j) / sum; h -= pj * math.log(pj) }
          j += 1
        }
        if (math.abs(h - targetH) < 1e-5) tries = 50
        else {
          if (h > targetH) { betaMin = beta; beta = if (betaMax.isInfinite) beta * 2 else (beta + betaMax) / 2 }
          else { betaMax = beta; beta = if (betaMin.isInfinite) beta / 2 else (beta + betaMin) / 2 }
          tries += 1
        }
        val sumF = if (sum <= 0) 1.0 else sum
        var jj = 0
        while (jj < n) { pCond(i)(jj) = row(jj) / sumF; jj += 1 }
      }
    }

    // symmetrize, floor
    val P = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- 0 until n)
      P(i)(j) = math.max((pCond(i)(j) + pCond(j)(i)) / (2.0 * n), 1e-12)

    // init + gradient descent with momentum and early exaggeration
    val rnd = new scala.util.Random(42)
    val y = Array.fill(n, dims)(rnd.nextGaussian() * 1e-4)
    val dy = Array.ofDim[Double](n, dims)
    val gains = Array.fill(n, dims)(1.0)
    val exagIters = math.min(iters, 50)
    for (iter <- 0 until iters) {
      val exag = if (iter < exagIters) 4.0 else 1.0
      // q distribution (student-t)
      val num = Array.ofDim[Double](n, n)
      var qSum = 0.0
      for (i <- 0 until n; j <- (i + 1) until n) {
        var s = 0.0; var k = 0
        while (k < dims) { val t = y(i)(k) - y(j)(k); s += t * t; k += 1 }
        val v = 1.0 / (1.0 + s)
        num(i)(j) = v; num(j)(i) = v; qSum += 2 * v
      }
      if (qSum <= 0) qSum = Double.MinPositiveValue
      val momentum = if (iter < 20) 0.5 else 0.8
      for (i <- 0 until n) {
        val grad = new Array[Double](dims)
        for (j <- 0 until n if j != i) {
          val q = math.max(num(i)(j) / qSum, 1e-12)
          val mult = (exag * P(i)(j) - q) * num(i)(j)
          var k = 0
          while (k < dims) { grad(k) += 4.0 * mult * (y(i)(k) - y(j)(k)); k += 1 }
        }
        var k = 0
        while (k < dims) {
          // gains capped at 4 and the per-coordinate step clipped to 1 map
          // unit per iteration: the exact algorithm on a small result page
          // (block-structured P, all num≈1 at init) otherwise accelerates
          // ballistically — momentum carries points to ~1e4 where every
          // gradient vanishes and the layout freezes scattered. Clipping
          // bounds the velocity without constraining convergence (equilibrium
          // inter-cluster distances are O(10) units, reachable in well under
          // the default 100 iterations).
          gains(i)(k) = math.min(4.0, math.max(0.01,
            if ((grad(k) > 0) != (dy(i)(k) > 0)) gains(i)(k) + 0.2 else gains(i)(k) * 0.8))
          var step = momentum * dy(i)(k) - eta * gains(i)(k) * grad(k)
          if (step > 1.0) step = 1.0 else if (step < -1.0) step = -1.0
          dy(i)(k) = step
          y(i)(k) += step
          k += 1
        }
      }
      // re-center
      val mean = new Array[Double](dims)
      for (i <- 0 until n; k <- 0 until dims) mean(k) += y(i)(k) / n
      for (i <- 0 until n; k <- 0 until dims) y(i)(k) -= mean(k)
    }
    y.map(_.map(_.toFloat))
  }
}
