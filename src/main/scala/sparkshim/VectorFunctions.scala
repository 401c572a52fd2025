package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import graft.model.Metric

/**
 * Vector distance kernels as native Catalyst expressions with whole-stage
 * codegen — the Spark analogue of weaviate's SIMD distancers
 * (reference: adapters/repos/db/vector/hnsw/distancer/{cosine_dist.go,
 * dot_product.go,l2.go,manhattan.go,hamming.go}; metric set
 * entities/vectorindex/common). Inputs are `array<float>` columns; math is
 * double-precision; the generated code is a tight primitive loop inside
 * WholeStageCodegen (no boxing, no UDF serialization).
 *
 * Scale note: at 100 TB a brute-force distance scan is embarrassingly
 * parallel — per-partition TopK (TakeOrderedAndProject) means only k rows per
 * partition cross the shuffle to the driver-side final heap.
 */
abstract class VectorDistance extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java source for the accumulation loop body; sees `n`, `a`, `b`, writes
   * `acc`. Placeholders __N__/__ACC__/__I__ (and helper vars __DOT__/__NA__/
   * __NB__/__X__/__Y__/__D__) are rewritten to ctx.freshName'd identifiers —
   * two distance expressions in one codegen stage (multi-target search,
   * dedup verify joins) must not collide on local variable names, or the
   * whole stage silently falls back to interpreted eval. DELIMITED tokens,
   * not bare N/I: a bare substring replace would mangle any body text that
   * merely contains those letters (Double.NEGATIVE_INFINITY, Integer, …). */
  protected def loopBody(a: String, b: String): String
  protected def finishCode(acc: String): String = acc

  protected def dist(x: ArrayData, y: ArrayData): Double

  private def checkDims(nl: Int, nr: Int): Unit =
    if (nl != nr) throw new IllegalArgumentException(
      s"$prettyName: vector dimension mismatch ($nl vs $nr)")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]; val y = r.asInstanceOf[ArrayData]
    // UnsafeArrayData has NO bounds check — a silent mismatch would read
    // adjacent heap bytes into the distance (the reference errors instead)
    checkDims(x.numElements(), y.numElements())
    dist(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val renamed = Seq("__DOT__" -> "dot", "__NA__" -> "na", "__NB__" -> "nb",
          "__X__" -> "x", "__Y__" -> "y", "__D__" -> "d")
        .foldLeft(loopBody(a, b)) {
          case (body, (ph, base)) => body.replace(ph, ctx.freshName(base))
        }
        .replace("__ACC__", acc).replace("__N__", n).replace("__I__", i)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) throw new IllegalArgumentException(
         |  "$prettyName: vector dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |double $acc = 0.0;
         |$renamed
         |${ev.value} = ${finishCode(acc)};
       """.stripMargin
    })
}

/** l2-squared (reference: distancer/l2.go). */
case class L2SquaredDistance(left: Expression, right: Expression) extends VectorDistance {
  override def prettyName: String = "l2_squared"
  protected def loopBody(a: String, b: String): String =
    s"""for (int __I__ = 0; __I__ < __N__; __I__++) {
       |  double __D__ = (double) $a.getFloat(__I__) - (double) $b.getFloat(__I__);
       |  __ACC__ += __D__ * __D__;
       |}""".stripMargin
  protected def dist(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; acc += d * d; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** cosine distance = 1 - cos(a,b) (reference: distancer/cosine_dist.go). */
case class CosineDistance(left: Expression, right: Expression) extends VectorDistance {
  override def prettyName: String = "cosine_distance"
  protected def loopBody(a: String, b: String): String =
    s"""double __DOT__ = 0.0, __NA__ = 0.0, __NB__ = 0.0;
       |for (int __I__ = 0; __I__ < __N__; __I__++) {
       |  double __X__ = (double) $a.getFloat(__I__); double __Y__ = (double) $b.getFloat(__I__);
       |  __DOT__ += __X__ * __Y__; __NA__ += __X__ * __X__; __NB__ += __Y__ * __Y__;
       |}
       |__ACC__ = (__NA__ == 0.0 || __NB__ == 0.0) ? 1.0 : 1.0 - __DOT__ / Math.sqrt(__NA__ * __NB__);""".stripMargin
  protected def dist(x: ArrayData, y: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      val a = x.getFloat(i).toDouble; val b = y.getFloat(i).toDouble
      dot += a * b; na += a * a; nb += b * b; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** negative dot product (reference: distancer/dot_product.go — more similar = smaller). */
case class DotDistance(left: Expression, right: Expression) extends VectorDistance {
  override def prettyName: String = "dot_distance"
  protected def loopBody(a: String, b: String): String =
    s"""for (int __I__ = 0; __I__ < __N__; __I__++) {
       |  __ACC__ += (double) $a.getFloat(__I__) * (double) $b.getFloat(__I__);
       |}""".stripMargin
  override protected def finishCode(acc: String): String = s"-$acc"
  protected def dist(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    -acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** manhattan / L1 (reference: distancer/manhattan.go). */
case class ManhattanDistance(left: Expression, right: Expression) extends VectorDistance {
  override def prettyName: String = "manhattan_distance"
  protected def loopBody(a: String, b: String): String =
    s"""for (int __I__ = 0; __I__ < __N__; __I__++) {
       |  __ACC__ += Math.abs((double) $a.getFloat(__I__) - (double) $b.getFloat(__I__));
       |}""".stripMargin
  protected def dist(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { acc += math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** hamming: count of differing positions (reference: distancer/hamming.go). */
case class HammingDistance(left: Expression, right: Expression) extends VectorDistance {
  override def prettyName: String = "hamming_distance"
  protected def loopBody(a: String, b: String): String =
    s"""for (int __I__ = 0; __I__ < __N__; __I__++) {
       |  if ($a.getFloat(__I__) != $b.getFloat(__I__)) __ACC__ += 1.0;
       |}""".stripMargin
  protected def dist(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { if (x.getFloat(i) != y.getFloat(i)) acc += 1.0; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/**
 * Haversine distance in meters between (lat1,lon1) and (lat2,lon2) — powers
 * WithinGeoRange (reference: vector/hnsw/distancer/geo_spatial.go:19-41;
 * filter filters.go:33). Uses the same formula/earth radius as the reference.
 */
case class HaversineMeters(
    lat1: Expression, lon1: Expression, lat2: Expression, lon2: Expression)
  extends QuaternaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq.fill(4)(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2
  override def prettyName: String = "haversine_meters"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineMeters.compute(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"org.apache.spark.sql.graft.HaversineMeters.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression) = copy(a, b, c, d)
}

object HaversineMeters {
  private val EarthRadiusMeters = 6371000.0
  /** Called from generated code — must stay public static-reachable. */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * EarthRadiusMeters * math.asin(math.min(1.0, math.sqrt(a)))
  }
}

/**
 * MaxSim late interaction for multi-vector (ColBERT-style) embeddings:
 * score = Σ_i max_j (q_i · d_j); returned as a *distance* (negated) to keep
 * smaller-is-better ordering (reference: shard_read.go:687-698,
 * vector/multivector/). Inputs: array<array<float>> query and doc.
 */
case class MaxSimDistance(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ArrayType(FloatType)), ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "maxsim_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]; val d = r.asInstanceOf[ArrayData]
    var score = 0.0
    var i = 0
    val nq = q.numElements(); val nd = d.numElements()
    while (i < nq) {
      val qi = q.getArray(i)
      val dim = qi.numElements()
      var best = Double.NegativeInfinity
      var j = 0
      while (j < nd) {
        val dj = d.getArray(j)
        var dot = 0.0; var k = 0
        while (k < dim) { dot += qi.getFloat(k).toDouble * dj.getFloat(k).toDouble; k += 1 }
        if (dot > best) best = dot
        j += 1
      }
      if (nd > 0) score += best
      i += 1
    }
    -score
  }

  // Whole-stage codegen of the full MaxSim nested loop — the token×token dot
  // products run as primitive Java inside the stage, no boxing or virtual
  // calls (parity with the interpreted path asserted in VectorFunctionsSpec).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nq = ctx.freshName("nq"); val nd = ctx.freshName("nd")
      val score = ctx.freshName("score"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val qi = ctx.freshName("qi"); val dj = ctx.freshName("dj")
      val best = ctx.freshName("best"); val dot = ctx.freshName("dot")
      val dim = ctx.freshName("dim")
      val arrayData = classOf[ArrayData].getName
      s"""
         |int $nq = $a.numElements();
         |int $nd = $b.numElements();
         |double $score = 0.0;
         |for (int $i = 0; $i < $nq; $i++) {
         |  $arrayData $qi = $a.getArray($i);
         |  int $dim = $qi.numElements();
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $nd; $j++) {
         |    $arrayData $dj = $b.getArray($j);
         |    double $dot = 0.0;
         |    for (int $k = 0; $k < $dim; $k++) {
         |      $dot += (double) $qi.getFloat($k) * (double) $dj.getFloat($k);
         |    }
         |    if ($dot > $best) $best = $dot;
         |  }
         |  if ($nd > 0) $score += $best;
         |}
         |${ev.value} = -$score;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/**
 * Top-`take` nearest coarse-quantizer centroids of a vector, squared-L2 in
 * the KMeans training space (reference: the IVF/PQ cluster-assignment step of
 * vector/compressionhelpers; our IvfIndex.build / KnnJoin.bucketed). The
 * centroid table is a driver-side constant baked into the expression as a
 * codegen reference object — nlist × dim doubles, ships with the serialized
 * plan, no broadcast lifecycle to manage — and the argmin loop runs as
 * primitive Java inside WholeStageCodegen (replaces the boxed per-row UDF).
 * Ties rank the lower centroid id first (stable, matching sortBy).
 */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], take: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(take >= 1 && take <= centroids.length, "take must be in [1, nlist]")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      NearestCentroids.compute(v.asInstanceOf[ArrayData], centroids, take))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    val helper = NearestCentroids.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new $gad($helper.compute($a, $cents, $take));")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * RNG (Relative Neighborhood Graph) replica selection — the posting
 * assignment rule of the reference's hfresh/SPFresh index
 * (adapters/repos/db/vector/hfresh/rng.go:16-69, DefaultRNGFactor = 10):
 * walk candidate centroids by increasing query distance and select one
 * unless it is "too close" to an already-selected replica —
 * dist(candidate, selected) ≤ (1/rngFactor)·dist(query, candidate) — until
 * `replicas` are chosen. Boundary vectors therefore land in SEVERAL
 * well-separated posting lists, which is what protects low-probe recall;
 * interior vectors select only their single nearest list (every other
 * candidate fails the rule), so storage grows with boundary density, not
 * uniformly ×replicas. The centroid-centroid distance matrix is precomputed
 * at build and rides the plan as a reference object.
 */
case class RngSelectCentroids(child: Expression, centroids: Array[Array[Double]],
                              centDists: Array[Array[Double]],
                              replicas: Int, rngFactor: Double)
  extends UnaryExpression with ExpectsInputTypes {
  require(replicas >= 1 && replicas <= centroids.length, "replicas must be in [1, nlist]")
  require(rngFactor > 0, "rngFactor must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rng_select_centroids"

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      RngSelectCentroids.compute(v.asInstanceOf[ArrayData], centroids, centDists,
        replicas, rngFactor))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val cd = ctx.addReferenceObj("centDists", centDists, "double[][]")
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    val helper = RngSelectCentroids.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new $gad($helper.compute($a, $cents, $cd, $replicas, $rngFactor));")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object RngSelectCentroids {
  /** Called from generated code — must stay public static-reachable. */
  def compute(v: ArrayData, cents: Array[Array[Double]], centDists: Array[Array[Double]],
              replicas: Int, rngFactor: Double): Array[Int] = {
    val n = cents.length
    val dists = new Array[Double](n)
    var ci = 0
    while (ci < n) {
      val c = cents(ci)
      var d = 0.0; var i = 0
      while (i < c.length) { val t = c(i) - v.getFloat(i); d += t * t; i += 1 }
      dists(ci) = d
      ci += 1
    }
    // candidates in increasing query distance (ties → lower id, stable)
    val order = Array.range(0, n).sortBy(i => (dists(i), i))
    val selected = new Array[Int](replicas)
    var m = 0
    var oi = 0
    // rng.go compares SQUARED distances directly (the distancer is l2²), so
    // the rule here is centDist² ≤ (1/rngFactor)·queryDist²
    val inv = 1.0 / rngFactor
    while (oi < n && m < replicas) {
      val cand = order(oi)
      var tooClose = false
      var si = 0
      while (!tooClose && si < m) {
        if (centDists(cand)(selected(si)) <= inv * dists(cand)) tooClose = true
        si += 1
      }
      if (!tooClose) { selected(m) = cand; m += 1 }
      oi += 1
    }
    java.util.Arrays.copyOf(selected, m)
  }

  /** nlist × nlist centroid l2² matrix, computed once at build. */
  def pairwise(cents: Array[Array[Double]]): Array[Array[Double]] = {
    val n = cents.length
    val out = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var d = 0.0; var k = 0
        while (k < cents(i).length) { val t = cents(i)(k) - cents(j)(k); d += t * t; k += 1 }
        out(i)(j) = d; out(j)(i) = d
        j += 1
      }
      i += 1
    }
    out
  }
}

object NearestCentroids {
  /** Called from generated code — must stay public static-reachable. */
  def compute(v: ArrayData, cents: Array[Array[Double]], take: Int): Array[Int] = {
    val n = cents.length
    val dists = new Array[Double](n)
    var ci = 0
    while (ci < n) {
      val c = cents(ci)
      var d = 0.0; var i = 0
      while (i < c.length) { val t = c(i) - v.getFloat(i); d += t * t; i += 1 }
      dists(ci) = d
      ci += 1
    }
    // partial selection: O(nlist × take), take is small (nprobe/replicas)
    val out = new Array[Int](take)
    val used = new Array[Boolean](n)
    var k = 0
    while (k < take) {
      var best = -1; var bestD = Double.PositiveInfinity
      var i = 0
      while (i < n) {
        if (!used(i) && dists(i) < bestD) { bestD = dists(i); best = i }
        i += 1
      }
      if (best < 0) {
        // a NaN component makes every comparison false — assign such rows
        // to the first unused centroid deterministically instead of
        // crashing the whole job on one bad embedding
        var j = 0
        while (j < n && used(j)) j += 1
        best = j
      }
      used(best) = true; out(k) = best
      k += 1
    }
    out
  }
}

/**
 * Binary-quantization encoder: sign bit per dimension packed into longs,
 * bit set when the component is negative — bit-for-bit the reference's
 * BQ code layout (compressionhelpers/binary_quantization.go:29-47: block =
 * 64 dims, `if vec[i] < 0 { bits |= bit }`). ceil(d/64) longs per vector:
 * 32× smaller than the float column, so the BQ first pass streams a tiny
 * code column instead of the vectors.
 */
case class SignPack(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_pack"

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      SignPack.pack(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    val helper = SignPack.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = new $gad($helper.pack($a));")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SignPack {
  /** Called from generated code — must stay public static-reachable. */
  def pack(v: ArrayData): Array[Long] = {
    val n = v.numElements()
    val out = new Array[Long]((n + 63) >> 6)
    var i = 0
    while (i < n) {
      if (v.getFloat(i) < 0f) out(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    out
  }
  /** Driver-side twin for query vectors. */
  def pack(v: Array[Float]): Array[Long] = {
    val out = new Array[Long]((v.length + 63) >> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) < 0f) out(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    out
  }
}

/**
 * Hamming distance between two packed bit codes (array<long>): popcount of
 * the XOR, the reference's HammingBitwise over BQ codes
 * (distancer/hamming.go bitwise variant; used by
 * BinaryQuantizer.DistanceBetweenCompressedVectors). Tight primitive loop,
 * Long.bitCount is an intrinsic.
 */
case class BitHammingDistance(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bit_hamming"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]; val y = r.asInstanceOf[ArrayData]
    var acc = 0L; var i = 0; val n = x.numElements()
    while (i < n) { acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/**
 * Scalar-quantization encoder: one byte per dimension under the global affine
 * map code_i = clamp(floor((x_i − b) · 255 / a), 0, 255), followed by two
 * big-endian uint32 tails (Σcode, Σcode²) — byte-for-byte the reference's SQ
 * code layout (compressionhelpers/scalar_quantization.go:112-134). 4×
 * compression; the sum tail lets dot/cosine distances be computed purely in
 * the compressed domain (SqCodeDistance) without touching the floats.
 */
case class SqEncode(child: Expression, a: Float, b: Float)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_encode"

  override def nullSafeEval(v: Any): Any =
    SqOps.encode(v.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SqOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $helper.encode($x, ${a}f, ${b}f);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Distance between two SQ codes in the compressed domain (reference:
 * scalar_quantization.go:39-53 DistanceBetweenCompressedVectors):
 *   l2      → a²/255² · Σ(x_i−y_i)²
 *   dot     → −(a²/255²·Σx_iy_i + ab/255·(Σx+Σy) + b²·d)
 *   cosine  → 1 − (a²/255²·Σx_iy_i + ab/255·(Σx+Σy) + b²·d)
 * metric: 0=l2-squared, 1=dot, 2=cosine-dot. Tight primitive byte loop
 * inside WholeStageCodegen.
 */
case class SqCodeDistance(left: Expression, right: Expression,
                          a: Float, b: Float, metric: Int)
  extends BinaryExpression with ExpectsInputTypes {
  require(metric >= 0 && metric <= 2, s"SQ distance unsupported for metric code $metric")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_code_distance"

  override def nullSafeEval(l: Any, r: Any): Any =
    SqOps.distance(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]], a, b, metric)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SqOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = $helper.distance($x, $y, ${a}f, ${b}f, $metric);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

object SqOps {
  private val Codes = 255.0

  /** Called from generated code — must stay public static-reachable. */
  def encode(v: ArrayData, a: Float, b: Float): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n + 8)
    var sum = 0L; var sum2 = 0L
    var i = 0
    while (i < n) {
      val c = codeFor(v.getFloat(i), a, b)
      out(i) = c.toByte
      sum += c; sum2 += c.toLong * c
      i += 1
    }
    putTails(out, n, sum, sum2)
    out
  }

  /** Driver-side twin for query vectors. */
  def encode(v: Array[Float], a: Float, b: Float): Array[Byte] = {
    val out = new Array[Byte](v.length + 8)
    var sum = 0L; var sum2 = 0L
    var i = 0
    while (i < v.length) {
      val c = codeFor(v(i), a, b)
      out(i) = c.toByte
      sum += c; sum2 += c.toLong * c
      i += 1
    }
    putTails(out, v.length, sum, sum2)
    out
  }

  // clamp-then-floor bucket map (reference scalar_quantization.go:112-120)
  private def codeFor(x: Float, a: Float, b: Float): Int =
    if (x < b) 0
    else if (x - b > a) 255
    else math.floor((x - b) * Codes / a).toInt

  private def putTails(out: Array[Byte], n: Int, sum: Long, sum2: Long): Unit = {
    out(n) = (sum >>> 24).toByte; out(n + 1) = (sum >>> 16).toByte
    out(n + 2) = (sum >>> 8).toByte; out(n + 3) = sum.toByte
    out(n + 4) = (sum2 >>> 24).toByte; out(n + 5) = (sum2 >>> 16).toByte
    out(n + 6) = (sum2 >>> 8).toByte; out(n + 7) = sum2.toByte
  }

  private def sumOf(x: Array[Byte]): Long = {
    val n = x.length - 8
    ((x(n) & 0xffL) << 24) | ((x(n + 1) & 0xffL) << 16) |
      ((x(n + 2) & 0xffL) << 8) | (x(n + 3) & 0xffL)
  }

  /** Called from generated code — must stay public static-reachable. */
  def distance(x: Array[Byte], y: Array[Byte], a: Float, b: Float, metric: Int): Double = {
    val d = x.length - 8
    val a2 = a.toDouble * a / (Codes * Codes)
    metric match {
      case 0 =>
        var acc = 0L; var i = 0
        while (i < d) {
          val t = (x(i) & 0xff) - (y(i) & 0xff)
          acc += t.toLong * t; i += 1
        }
        a2 * acc
      case _ =>
        var dot = 0L; var i = 0
        while (i < d) { dot += (x(i) & 0xff).toLong * (y(i) & 0xff); i += 1 }
        val ab = a.toDouble * b / Codes
        val ib2 = b.toDouble * b * d
        val sim = a2 * dot + ab * (sumOf(x) + sumOf(y)) + ib2
        if (metric == 1) -sim else 1.0 - sim
    }
  }
}

/**
 * Fast random rotation for rotational quantization (reference:
 * entities/vectorindex/compression/fast_rotation.go): `rounds` rounds of
 * [random perfect-matching swaps with random signs, then blockwise
 * orthonormal fast Walsh–Hadamard transforms (256-blocks, 64 tail)], output
 * dimension padded to a multiple of 64. The composition is orthogonal, so
 * dot products and norms are preserved — which is what makes the per-vector
 * scalar quantization after it (RqOps.encode) accurate without training.
 * Seed-deterministic; the concrete RNG differs from the reference's PCG (an
 * internal randomness source, not a semantic), the structure is identical.
 */
final case class FastRotationSpec(outputDim: Int, swaps: Array[Array[Int]],
                                  signs: Array[Array[Float]]) extends Serializable {

  /** rotate into a fresh padded buffer (fast_rotation.go:200-211 swap loop). */
  def rotate(x: Array[Float]): Array[Float] = {
    val rx = new Array[Float](outputDim)
    System.arraycopy(x, 0, rx, 0, math.min(x.length, outputDim))
    var r = 0
    while (r < swaps.length) {
      val sw = swaps(r); val sg = signs(r)
      var s = 0
      while (s < sw.length) {
        val i = sw(s); val j = sw(s + 1)
        val t = sg(i) * rx(j)
        rx(j) = sg(j) * rx(i)
        rx(i) = t
        s += 2
      }
      FastRotationSpec.fwhtBlocks(rx)
      r += 1
    }
    rx
  }
}

object FastRotationSpec {

  /** outputDim = next multiple of 64 ≥ inputDim (fast_rotation.go:126-145). */
  def apply(inputDim: Int, rounds: Int, seed: Long): FastRotationSpec = {
    var outputDim = 64
    while (outputDim < inputDim) outputDim += 64
    val rng = new java.util.Random(seed)
    val swaps = Array.fill(rounds) {
      // random perfect matching: shuffle 0..n-1, pair consecutive elements
      val p = Array.tabulate(outputDim)(identity)
      var i = outputDim - 1
      while (i > 0) { val j = rng.nextInt(i + 1); val t = p(i); p(i) = p(j); p(j) = t; i -= 1 }
      val flat = new Array[Int](outputDim)
      var s = 0
      while (s < outputDim) {
        val (a, b) = (p(s), p(s + 1))
        flat(s) = math.min(a, b); flat(s + 1) = math.max(a, b)
        s += 2
      }
      flat
    }
    val signs = Array.fill(rounds)(
      Array.fill(outputDim)(if (rng.nextBoolean()) 1.0f else -1.0f))
    FastRotationSpec(outputDim, swaps, signs)
  }

  /** blockwise orthonormal FWHT: 256-blocks while possible, 64 tail
   * (fast_rotation.go:215-226; normalization 1/√block). */
  private[graft] def fwhtBlocks(x: Array[Float]): Unit = {
    var pos = 0
    while (pos < x.length) {
      val block = if (x.length - pos >= 256) 256 else 64
      fwht(x, pos, block)
      pos += block
    }
  }

  private def fwht(x: Array[Float], off: Int, n: Int): Unit = {
    val norm = (1.0 / math.sqrt(n)).toFloat
    var i = 0
    while (i < n) { x(off + i) *= norm; i += 1 }
    var len = 1
    while (len < n) {
      var b = 0
      while (b < n) {
        var j = b
        while (j < b + len) {
          val a = x(off + j); val c = x(off + j + len)
          x(off + j) = a + c; x(off + j + len) = a - c
          j += 1
        }
        b += len * 2
      }
      len *= 2
    }
  }
}

/**
 * Rotational-quantization encoder: rotate, then per-VECTOR affine byte codes
 * with a 16-byte metadata header [lower, step, step·Σcode, ‖x‖²] (big-endian
 * float32) + outputDim code bytes — the reference's RQCode layout
 * (compressionhelpers/rotational_quantization.go:104-216). Training-free:
 * the quantization grid adapts per vector, the rotation spreads mass across
 * dimensions so the grid is tight.
 */
case class RqEncode(child: Expression, rotation: FastRotationSpec)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rq_encode"

  override def nullSafeEval(v: Any): Any = {
    val ad = v.asInstanceOf[ArrayData]
    val x = new Array[Float](ad.numElements())
    var i = 0
    while (i < x.length) { x(i) = ad.getFloat(i); i += 1 }
    RqOps.encode(x, rotation)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rot = ctx.addReferenceObj("rotation", rotation,
      classOf[FastRotationSpec].getName)
    val helper = RqOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $helper.encodeArrayData($x, $rot);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Distance between two RQ codes (rotational_quantization.go:297-309
 * DistanceBetweenCompressedVectors): dot estimate from the per-vector grids
 *   d·lxly + lx·csy + ly·csx + sx·sy·Σ(bytex·bytey)
 * then l2 → n2x+n2y−2·est, dot → −est, cosine → 1−est.
 * metric: 0=l2-squared, 1=dot, 2=cosine-dot.
 */
case class RqCodeDistance(left: Expression, right: Expression, metric: Int)
  extends BinaryExpression with ExpectsInputTypes {
  require(metric >= 0 && metric <= 2, s"RQ distance unsupported for metric code $metric")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rq_code_distance"

  override def nullSafeEval(l: Any, r: Any): Any =
    RqOps.distance(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]], metric)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = RqOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = $helper.distance($x, $y, $metric);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

object RqOps {
  private val MetaSize = 16

  /** Called from generated code — must stay public static-reachable. */
  def encodeArrayData(v: ArrayData, rot: FastRotationSpec): Array[Byte] = {
    val x = new Array[Float](v.numElements())
    var i = 0
    while (i < x.length) { x(i) = v.getFloat(i); i += 1 }
    encode(x, rot)
  }

  /** rotational_quantization.go:185-216 — per-vector grid + metadata. */
  def encode(x: Array[Float], rot: FastRotationSpec): Array[Byte] = {
    val outDim = rot.outputDim
    val out = new Array[Byte](outDim + MetaSize)
    if (x.isEmpty) return out
    val rx = rot.rotate(x)
    var lower = rx(0); var upper = rx(0)
    var i = 1
    while (i < outDim) {
      val v = rx(i)
      if (v < lower) lower = v
      if (v > upper) upper = v
      i += 1
    }
    val step = (upper - lower) / 255.0f
    if (step <= 0f) {
      // CONSTANT rotation (upper == lower — includes non-zero inputs whose
      // mass lands evenly): codes all 0 with the constant as `lower` is
      // exact, but `lower` and ‖x‖² must still be recorded — an all-zero
      // header is only correct for the true zero vector and silently
      // corrupts l2 estimates otherwise
      var n2 = 0.0f
      var j = 0
      while (j < x.length) { n2 += x(j) * x(j); j += 1 }
      putF32(out, 0, lower)
      putF32(out, 12, n2)
      return out
    }
    var codeSum = 0L
    i = 0
    while (i < outDim) {
      val c = math.min(255, ((rx(i) - lower) / step + 0.5f).toInt)
      out(MetaSize + i) = c.toByte
      codeSum += c
      i += 1
    }
    var norm2 = 0.0f
    i = 0
    while (i < x.length) { norm2 += x(i) * x(i); i += 1 }
    putF32(out, 0, lower)
    putF32(out, 4, step)
    putF32(out, 8, step * codeSum)
    putF32(out, 12, norm2)
    out
  }

  /** Called from generated code — must stay public static-reachable. */
  def distance(x: Array[Byte], y: Array[Byte], metric: Int): Double = {
    val d = x.length - MetaSize
    val lx = getF32(x, 0); val sx = getF32(x, 4); val csx = getF32(x, 8)
    val ly = getF32(y, 0); val sy = getF32(y, 4); val csy = getF32(y, 8)
    var dot = 0L
    var i = MetaSize
    while (i < x.length) { dot += (x(i) & 0xff).toLong * (y(i) & 0xff); i += 1 }
    val est = d.toDouble * lx * ly + lx.toDouble * csy + ly.toDouble * csx +
      sx.toDouble * sy * dot
    metric match {
      case 0 => getF32(x, 12).toDouble + getF32(y, 12) - 2.0 * est
      case 1 => -est
      case _ => 1.0 - est
    }
  }

  private def putF32(b: Array[Byte], pos: Int, x: Float): Unit = {
    val bits = java.lang.Float.floatToIntBits(x)
    b(pos) = (bits >>> 24).toByte; b(pos + 1) = (bits >>> 16).toByte
    b(pos + 2) = (bits >>> 8).toByte; b(pos + 3) = bits.toByte
  }

  private def getF32(b: Array[Byte], pos: Int): Float =
    java.lang.Float.intBitsToFloat(
      ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
        ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff))
}

/** Column-level API over the kernels. */
object VectorFunctions {
  private def c(e: Expression): Column = ExpressionUtils.column(e)
  private def x(col: Column): Expression = ExpressionUtils.expression(col)

  def l2Squared(a: Column, b: Column): Column = c(L2SquaredDistance(x(a), x(b)))
  def cosineDistance(a: Column, b: Column): Column = c(CosineDistance(x(a), x(b)))
  def dotDistance(a: Column, b: Column): Column = c(DotDistance(x(a), x(b)))
  def manhattan(a: Column, b: Column): Column = c(ManhattanDistance(x(a), x(b)))
  def hamming(a: Column, b: Column): Column = c(HammingDistance(x(a), x(b)))
  def maxSim(q: Column, d: Column): Column = c(MaxSimDistance(x(q), x(d)))
  def nearestCentroids(v: Column, centroids: Array[Array[Double]], take: Int): Column =
    c(NearestCentroids(x(v), centroids, take))
  def rngSelectCentroids(v: Column, centroids: Array[Array[Double]],
                         replicas: Int, rngFactor: Double): Column =
    c(RngSelectCentroids(x(v), centroids, RngSelectCentroids.pairwise(centroids),
      replicas, rngFactor))
  def signPack(v: Column): Column = c(SignPack(x(v)))
  def bitHamming(a: Column, b: Column): Column = c(BitHammingDistance(x(a), x(b)))
  def sqEncode(v: Column, a: Float, b: Float): Column = c(SqEncode(x(v), a, b))
  def rqEncode(v: Column, rot: FastRotationSpec): Column = c(RqEncode(x(v), rot))
  def rqCodeDistance(l: Column, r: Column, metric: Metric): Column =
    c(RqCodeDistance(x(l), x(r), metric match {
      case Metric.L2Squared => 0
      case Metric.Dot       => 1
      case Metric.Cosine    => 2
      case m => throw new IllegalArgumentException(s"RQ distance unsupported for $m")
    }))
  def sqCodeDistance(l: Column, r: Column, a: Float, b: Float, metric: Metric): Column =
    c(SqCodeDistance(x(l), x(r), a, b, metric match {
      case Metric.L2Squared => 0
      case Metric.Dot       => 1
      case Metric.Cosine    => 2
      case m => throw new IllegalArgumentException(s"SQ distance unsupported for $m")
    }))
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    c(HaversineMeters(x(lat1), x(lon1), x(lat2), x(lon2)))

  def distance(metric: Metric)(a: Column, b: Column): Column = metric match {
    case Metric.Cosine    => cosineDistance(a, b)
    case Metric.Dot       => dotDistance(a, b)
    case Metric.L2Squared => l2Squared(a, b)
    case Metric.Manhattan => manhattan(a, b)
    case Metric.Hamming   => hamming(a, b)
    case Metric.Default   => throw new IllegalStateException(
      "Metric.Default must be resolved against the schema's vectorMetrics " +
      "before planning (Graft.get/aggregate do this) — a direct operator call " +
      "needs a concrete metric")
  }

  /** certainty = 1 - d/2, cosine only (reference: entities/additional/distance.go:14-30). */
  def certaintyFromDistance(d: Column): Column =
    org.apache.spark.sql.functions.lit(1.0) - d / 2.0
}
