package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Boost / soft reranking (reference: entities/filters/boost.go:21-80;
 * scorer usecases/traverser/boost_scorer.go): over an overfetched candidate
 * pool, final = (1−w)·primaryNorm + w·boostValue, where boost conditions are
 *  - filter-match: 1/0 from a predicate,
 *  - decay: exp/gauss/linear falloff of |x − origin| / scale,
 *  - property-value: min-max-normalized property with optional log1p/sqrt
 *    modifier; negative weights demote.
 * Pure window/column math over the bounded pool — no extra scan.
 */
object Boost {

  sealed trait Condition { def weight: Double }
  final case class FilterMatch(predicate: Column, weight: Double) extends Condition
  final case class Decay(prop: Column, origin: Double, scale: Double,
                         kind: String = "exp", weight: Double = 1.0) extends Condition
  final case class PropertyValue(prop: Column, modifier: Option[String] = None,
                                 weight: Double = 1.0) extends Condition

  /** Rescore `pool` (already bounded by overfetch). `primaryScore` is the
   * search score (higher = better). */
  def rescore(pool: DataFrame, primaryScore: Column, conditions: Seq[Condition],
              boostWeight: Double): DataFrame = {
    val all = BoundedWindow.all()
    def minMax(c: Column): Column = {
      val mn = min(c).over(all); val mx = max(c).over(all)
      when(mx === mn, lit(1.0)).otherwise((c - mn) / (mx - mn))
    }
    val boostVal: Column = conditions.map {
      case FilterMatch(p, w) => when(p, lit(1.0)).otherwise(lit(0.0)) * w
      case Decay(p, origin, scale, kind, w) =>
        val d = abs(p.cast("double") - origin) / scale
        (kind match {
          case "gauss"  => exp(-(d * d))
          case "linear" => greatest(lit(1.0) - d, lit(0.0))
          case _        => exp(-d)
        }) * w
      case PropertyValue(p, modifier, w) =>
        val v = modifier match {
          case Some("log1p") => log1p(greatest(p.cast("double"), lit(0.0)))
          case Some("sqrt")  => sqrt(greatest(p.cast("double"), lit(0.0)))
          case _             => p.cast("double")
        }
        minMax(v) * w
    }.reduceOption[Column](_ + _).getOrElse(lit(0.0))

    pool.withColumn("_boosted_score",
      minMax(primaryScore) * (1.0 - boostWeight) + boostVal * boostWeight)
  }

  /**
   * The reference's EXACT post-scoring pass (boost_scorer.go
   * boostScoreAndSort, the pipeline form behind SearchRequest.boost):
   * per-result boost = Σ wᵢ·sᵢ / Σ|wᵢ| (a 0 weight reads as 1.0, negatives
   * demote — scoreResult:172-211); the primary score min-max normalizes
   * over the pool (a flat range normalizes to 1.0 so boost is the
   * tie-breaker); combined = (1−W)·primary + W·boost, then the COMBINED
   * scores re-normalize min-max to [0,1] for display (flat → 1.0); the pool
   * re-sorts by combined desc with id asc ties. `conds` are the
   * pre-compiled per-condition score columns with their weights.
   *
   * Returns the pool re-ordered with `scoreOut` carrying the final
   * normalized score. Window math over the depth-bounded pool only.
   */
  def applyBoost(pool: DataFrame, idCol: String, primaryScore: Column,
                 conds: Seq[(Column, Double)], weight: Double,
                 scoreOut: String): DataFrame = {
    val all = BoundedWindow.all()
    def minMaxOr1(c: Column): Column = {
      val mn = min(c).over(all); val mx = max(c).over(all)
      when(mx > mn, (c - mn) / (mx - mn)).otherwise(lit(1.0))
    }
    val weightSum = conds.map { case (_, w0) =>
      math.abs(if (w0 == 0) 1.0 else w0) }.sum
    val boostVal =
      if (weightSum == 0) lit(0.0)
      else conds.map { case (s, w0) =>
        val w = if (w0 == 0) 1.0 else w0
        s * w
      }.reduce(_ + _) / weightSum
    pool
      .withColumn("__boost_combined",
        minMaxOr1(primaryScore.cast("double")) * (1.0 - weight) + boostVal * weight)
      .withColumn(scoreOut, minMaxOr1(col("__boost_combined")))
      .drop("__boost_combined")
      .orderBy(col(scoreOut).desc, col(idCol).asc)
  }

  /** computeDecayFunction (boost_scorer.go:567-588) as a column: distance
   * `dist` (same unit as scale/offset), effectiveDist = max(0, dist−offset),
   * 0 → 1.0; exp: dv^(d/s); gauss: e^(ln(dv)·(d/s)²); linear:
   * max(0, 1−(1−dv)·d/s). Defaults: curve exp, decayValue 0.5
   * (parseDecayParams). NULL property → 0 (a result without the property
   * cannot decay-match). */
  def decayScore(dist: Column, offset: Double, scale0: Double,
                 curve0: String, decayValue0: Double): Column = {
    // scale <= 0 marks the whole condition invalid: every result scores 0
    // while the condition's |weight| still counts in the denominator
    // (parseDecayParams returns parsedDecay{} → computeDecayForResult 0,
    // boost_scorer.go:485-487,529-531)
    if (scale0 <= 0) return lit(0.0)
    val scale = scale0
    val dv = if (decayValue0 == 0) 0.5 else decayValue0
    val curve = if (curve0.isEmpty) "exp" else curve0
    val d = greatest(dist - offset, lit(0.0))
    val ratio = d / scale
    val s = curve match {
      case "gauss"  => exp(lit(math.log(dv)) * ratio * ratio)
      case "linear" => greatest(lit(1.0) - ratio * (1.0 - dv), lit(0.0))
      case _        => pow(lit(dv), ratio)
    }
    when(dist.isNull, lit(0.0)).when(d === 0.0, lit(1.0)).otherwise(s)
  }

  /** propertyValue condition score (precomputePropertyValueScores:
   * boost_scorer.go:225-290): modifier first (log1p/sqrt over max(0,v)),
   * min-max over PRESENT values only, missing → 0, flat range → 1.0. */
  def propertyValueScore(prop: Column, modifier: String): Column = {
    val all = BoundedWindow.all()
    val v = modifier match {
      case "log1p" => log1p(greatest(prop.cast("double"), lit(0.0)))
      case "sqrt"  => sqrt(greatest(prop.cast("double"), lit(0.0)))
      case _       => prop.cast("double")
    }
    val mn = min(v).over(all) // nulls excluded by min/max
    val mx = max(v).over(all)
    when(v.isNull, lit(0.0))
      .when(mx > mn, (v - mn) / (mx - mn))
      .otherwise(lit(1.0))
  }

  /** parseNumericOrDuration (boost_scorer.go:620-650): `<n>(d|h|m|s|ms)`
   * durations, then Go time.ParseDuration compounds ("1h30m", "100ns"),
   * then plain numbers — everything in NANOSECONDS (Go duration floats).
   * Throws NumberFormatException when nothing parses (the reference
   * returns err; callers decide invalid-vs-zero). */
  def parseNumericOrDuration(s: String): Double = {
    if (s.isEmpty) return 0.0
    val Dur = """^(\d+(?:\.\d+)?)(d|h|m|s|ms)$""".r
    s match {
      case Dur(n, u) =>
        val x = n.toDouble
        u match {
          case "d"  => x * 24 * 3600e9
          case "h"  => x * 3600e9
          case "m"  => x * 60e9
          case "s"  => x * 1e9
          case "ms" => x * 1e6
        }
      case other => parseGoDuration(other).getOrElse(other.toDouble)
    }
  }

  /** Go time.ParseDuration subset (boost_scorer.go:646-648 fallback):
   * optional sign, one or more `<num><unit>` segments with units
   * ns/us/µs/μs/ms/s/m/h; nanoseconds out. None when the shape doesn't
   * match (so plain-float fallback can run). */
  private def parseGoDuration(s: String): Option[Double] = {
    val (sign, body) =
      if (s.startsWith("-")) (-1.0, s.drop(1))
      else if (s.startsWith("+")) (1.0, s.drop(1))
      else (1.0, s)
    if (body.isEmpty) return None
    val Seg = """(\d+(?:\.\d+)?)(ns|us|µs|μs|ms|s|m|h)""".r
    val segs = Seg.findAllMatchIn(body).toList
    if (segs.isEmpty || segs.map(_.matched).mkString != body) return None
    val unitNs = Map("ns" -> 1.0, "us" -> 1e3, "µs" -> 1e3, "μs" -> 1e3,
      "ms" -> 1e6, "s" -> 1e9, "m" -> 60e9, "h" -> 3600e9)
    Some(sign * segs.map(m => m.group(1).toDouble * unitNs(m.group(2))).sum)
  }
}
