package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Collection
import graft.model.{FusionType, Metric, NearVector, Hybrid => HybridParams}

/**
 * Hybrid search: sparse (BM25) + dense (vector) legs fused
 * (reference: usecases/traverser/explorer_hybrid.go:37-120,
 * hybrid/searcher.go:75-156; fusion math hybrid/hybrid_fusion.go).
 *
 * Both legs are bounded top-N frames (overfetch, reference
 * explorer_hybrid.go:66-71), so the fusion full-outer join is a join of two
 * k-row frames — tiny at any collection size; ranks come from window
 * functions over those k rows. The expensive work (scan+TopK per leg) stays
 * embarrassingly parallel.
 */
object HybridSearch {

  val ScoreCol = "_hybrid_score"
  /** Original-leg score carried for tie-breaking (reference: hybrid_fusion.go:68-79 —
   * |Δscore| < 1e-7 falls back to SecondarySortValue desc, then id). */
  val SecondaryCol = "_secondary"
  private val RrfK = 60.0 // reference: hybrid_fusion.go rankedFusion constant

  def search(
      c: Collection,
      params: HybridParams,
      metric: Metric,
      limit: Int,
      overfetch: Int = 100,
      filtered: Option[DataFrame] = None): DataFrame = {
    val fetchN = math.max(limit, overfetch)
    val id = c.schema.idColumn

    val sparse: Option[DataFrame] =
      if (params.query.nonEmpty && params.alpha < 1.0)
        Some(Bm25Search.search(c, graft.model.Bm25(params.query, params.properties), fetchN, filtered)
          .select(col(id), col(Bm25Search.ScoreCol).as("__s_sparse")))
      else None

    val dense: Option[DataFrame] = params.vector.map { v =>
      val nv = NearVector(v, metric, distance = params.maxVectorDistance,
        targetVectors = params.targetVectors)
      VectorSearch.nearVector(c, nv, metric, Some(fetchN), filtered)
        // dense leg fusion input: similarity-like score, higher = better
        // (reference hybrid/searcher.go converts distance to 1 - d/2)
        .select(col(id), (lit(1.0) - col(VectorSearch.DistanceCol) / 2.0).as("__s_dense"))
    }.filter(_ => params.alpha > 0.0)

    val fused: DataFrame = (sparse, dense) match {
      case (Some(s), Some(d)) =>
        fuse(s, d, id, params.fusionType, 1.0 - params.alpha, params.alpha)
      case (Some(s), None) =>
        s.withColumn(ScoreCol, col("__s_sparse") * (1.0 - params.alpha))
          .withColumn(SecondaryCol, col("__s_sparse")).drop("__s_sparse")
      case (None, Some(d)) =>
        d.withColumn(ScoreCol, col("__s_dense") * params.alpha)
          .withColumn(SecondaryCol, col("__s_dense")).drop("__s_dense")
      case (None, None) =>
        throw new IllegalArgumentException("hybrid: neither query nor vector leg")
    }

    val ranked = fused
      .orderBy(col(ScoreCol).desc, col(SecondaryCol).desc_nulls_last, col(id).asc)
      .limit(limit)
    // decorate back with the collection's columns (ids are unique)
    ranked.join(filtered.getOrElse(c.df), Seq(id), "inner")
      .orderBy(col(ScoreCol).desc, col(SecondaryCol).desc_nulls_last, col(id).asc)
      .drop(SecondaryCol)
  }

  /**
   * Fuse two scored legs on the id column.
   * rankedFusion: score = Σ w_leg / (60 + rank_leg)  (hybrid_fusion.go:22-81)
   * relativeScore: min-max normalize each leg to [0,1], weighted sum
   * (hybrid_fusion.go:93-182; default since 1.24).
   */
  def fuse(
      sparse: DataFrame, dense: DataFrame, id: String,
      fusion: FusionType, wSparse: Double, wDense: Double): DataFrame = {
    fusion match {
      case FusionType.Ranked =>
        val rs = sparse.withColumn("__r_sparse",
          row_number().over(Window.orderBy(col("__s_sparse").desc, col(id).asc)))
        val rd = dense.withColumn("__r_dense",
          row_number().over(Window.orderBy(col("__s_dense").desc, col(id).asc)))
        rs.select(col(id), col("__r_sparse"), col("__s_sparse"))
          .join(rd.select(col(id), col("__r_dense"), col("__s_dense")), Seq(id), "full_outer")
          .withColumn(ScoreCol,
            coalesce(lit(wSparse) / (lit(RrfK) + col("__r_sparse")), lit(0.0)) +
            coalesce(lit(wDense) / (lit(RrfK) + col("__r_dense")), lit(0.0)))
          .withColumn(SecondaryCol, coalesce(col("__s_sparse"), col("__s_dense")))
          .drop("__r_sparse", "__r_dense", "__s_sparse", "__s_dense")
      case FusionType.RelativeScore =>
        def norm(df: DataFrame, scoreCol: String): DataFrame = {
          val w = Window.partitionBy()
          df.withColumn(s"${scoreCol}_n", {
            val mn = min(col(scoreCol)).over(w); val mx = max(col(scoreCol)).over(w)
            when(mx === mn, lit(1.0)).otherwise((col(scoreCol) - mn) / (mx - mn))
          })
        }
        norm(sparse, "__s_sparse").select(col(id), col("__s_sparse_n"), col("__s_sparse"))
          .join(norm(dense, "__s_dense").select(col(id), col("__s_dense_n"), col("__s_dense")),
            Seq(id), "full_outer")
          .withColumn(ScoreCol,
            coalesce(col("__s_sparse_n") * wSparse, lit(0.0)) +
            coalesce(col("__s_dense_n") * wDense, lit(0.0)))
          .withColumn(SecondaryCol, coalesce(col("__s_sparse"), col("__s_dense")))
          .drop("__s_sparse_n", "__s_dense_n", "__s_sparse", "__s_dense")
    }
  }

  /**
   * autocut — faithful port of the reference algorithm
   * (entities/autocut/autocut.go:14-51): over the ranked score curve, let
   * ynorm_i = (y_i − y_0)/(y_last − y_0), diff_i = ynorm_i − i/(n−1); count
   * local maxima of diff (last element compares against i−1 and i−2); cut
   * *before* the cutOff-th extremum; no such extremum → keep everything.
   * Expressed entirely with window functions over the bounded top-k frame.
   */
  def autocut(ranked: DataFrame, scoreCol: Column, id: Column, cuts: Int): DataFrame = {
    val w = Window.orderBy(scoreCol.desc, id.asc)
    val wAll = Window.partitionBy().orderBy(scoreCol.desc, id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = ranked
      .withColumn("__i", row_number().over(w) - 1)
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__y0", first(scoreCol).over(wAll))
      .withColumn("__yl", last(scoreCol).over(wAll))
    val ynorm = (scoreCol - col("__y0")) / (col("__yl") - col("__y0"))
    val diffed = base.withColumn("__diff",
      when(col("__n") <= 1 || col("__yl") === col("__y0"), lit(0.0))
        .otherwise(ynorm - col("__i").cast("double") / (col("__n") - 1)))
    val d = col("__diff")
    val dPrev = lag(d, 1).over(w); val dPrev2 = lag(d, 2).over(w); val dNext = lead(d, 1).over(w)
    val isExt = when(col("__i") === 0, lit(0))
      .when(col("__i") === col("__n") - 1,
        (d > dPrev && d > coalesce(dPrev2, dPrev)).cast("int"))
      .otherwise((d > dPrev && d > dNext).cast("int"))
    val marked = diffed
      .withColumn("__ext", isExt)
      .withColumn("__extCum", sum(col("__ext")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val cutAt = min(when(col("__ext") === 1 && col("__extCum") >= cuts, col("__i"))).over(wAll)
    marked.withColumn("__cut", cutAt)
      .filter(col("__cut").isNull || col("__i") < col("__cut"))
      .drop("__i", "__n", "__y0", "__yl", "__diff", "__ext", "__extCum", "__cut")
  }
}
