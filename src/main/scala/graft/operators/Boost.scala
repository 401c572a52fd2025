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
}
