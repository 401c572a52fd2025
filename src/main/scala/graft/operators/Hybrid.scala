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

  /** The reference ranks on FLOAT32 scores (search.Result.Score/
   * SecondarySortValue are float32, entities/search/result.go:26-27) with a
   * 1e-7 tie band (hybrid_fusion.go:70-79 — |Δ|² < 1e-14 falls through to
   * the secondary, then id ASC). 1e-7 is ~1 ulp of float32 near 1, so the
   * band is float32 equality to within rounding: ordering on the
   * float-cast score is the transitive total order that realizes it (the
   * raw epsilon comparator is intransitive and not a sort key). Scores stay
   * double in the OUTPUT — only the sort keys narrow. */
  private[graft] def rankOrder(id: String): Seq[Column] = Seq(
    col(ScoreCol).cast("float").desc,
    col(SecondaryCol).cast("float").desc_nulls_last, col(id).asc)
  private val RrfK = 60.0 // reference: hybrid_fusion.go rankedFusion constant

  /** Per-result fusion explanation (search.Result.ExplainScore — built by
   * the fusion itself, hybrid_fusion.go:40-48/140-144): one fragment per
   * contributing leg. */
  val ExplainCol = "_explainScore"

  /** Go %v-ish float render for explain fragments: whole floats drop the
   * ".0" (Go prints float32 2 as "2"). */
  private def goNum(c: Column): Column =
    when(c.cast("double") === c.cast("long").cast("double"),
      c.cast("long").cast("string")).otherwise(c.cast("float").cast("string"))

  def search(
      c: Collection,
      params: HybridParams,
      metric: Metric,
      limit: Int,
      overfetch: Int = 100,
      filtered: Option[DataFrame] = None,
      // engine-injected dense search (NearVector, fetchN) → ranked frame with
      // VectorSearch.DistanceCol — lets the hybrid dense leg route through the
      // registered ANN index + filter-selectivity planner instead of always
      // brute-forcing (reference: hybrid legs share the shard's vector index)
      denseSearch: Option[(NearVector, Int) => DataFrame] = None,
      // engine-injected keyword search (Bm25, fetchN) → frame carrying
      // (id, Bm25Search.ScoreCol) — lets the sparse leg serve from the
      // registered postings index instead of full-scan scoring (reference:
      // the hybrid sparse leg IS the shard's inverted index,
      // hybrid/searcher.go sparseSearch → bm25 objects search)
      sparseSearch: Option[(graft.model.Bm25, Int) => DataFrame] = None,
      // keep SecondaryCol in the output so a downstream re-rank (hybrid
      // groupBy pools) can break float32-collapsed ties the reference way;
      // the caller owns dropping it before projection
      keepSecondary: Boolean = false): DataFrame = {
    val fetchN = math.max(limit, overfetch)
    val id = c.schema.idColumn

    def bm25Leg(kw: graft.model.Bm25): DataFrame =
      sparseSearch.map(f => f(kw, fetchN))
        .getOrElse(Bm25Search.search(c, kw, fetchN, filtered))
        .select(col(id), col(Bm25Search.ScoreCol).as("__s"))

    def denseLeg(nv: NearVector): DataFrame =
      denseSearch.map(f => f(nv, fetchN))
        .getOrElse(VectorSearch.nearVector(c, nv, nv.metric, Some(fetchN), filtered))
        // dense leg fusion input: similarity-like score, higher = better
        // (reference hybrid/searcher.go converts distance to 1 - d/2)
        .select(col(id), (lit(1.0) - col(VectorSearch.DistanceCol) / 2.0).as("__s"))

    // explicit weighted sub-searches replace the alpha legs (reference:
    // retrieval.go:105-109 + common_filters/hybrid.go:72-111; nearText
    // subsearches are resolved to nearVector by the engine facade)
    val legs: Seq[(DataFrame, Double, String)] =
      if (params.subSearches.nonEmpty)
        params.subSearches.map { ss =>
          val df = ss.bm25.map(bm25Leg)
            .orElse(ss.nearVector.map(denseLeg))
            .getOrElse(throw new IllegalArgumentException(
              "hybrid subsearch: nearText must be resolved to nearVector before search"))
          (df, ss.weight, if (ss.bm25.isDefined) "keyword" else "vector")
        }
      else {
        val sparse =
          if (params.query.nonEmpty && params.alpha < 1.0)
            Some((bm25Leg(graft.model.Bm25(params.query, params.properties,
              params.searchOperator)), 1.0 - params.alpha, "keyword"))
          else None
        // a full multi-target dense leg (denseParams) takes precedence over
        // the plain vector (retrieval.go:123 NearVectorParams)
        val dense = params.denseParams.filter(_ => params.alpha > 0.0)
          .map(nv => (denseLeg(nv), params.alpha, "vector"))
          .orElse(params.vector.filter(_ => params.alpha > 0.0).map { v =>
            (denseLeg(NearVector(v, metric, distance = params.maxVectorDistance,
              targetVectors = params.targetVectors)), params.alpha, "vector")
          })
        Seq(sparse, dense).flatten
      }
    // no legs at all (empty query at alpha 0, or alpha 1 with no vector)
    // is a VALID degenerate search in the reference — hybrid/searcher.go
    // Search simply fuses nothing and returns empty, it never errors
    // (mcp query_hybrid_test.go TestQueryHybridEmptyQuery)
    if (legs.isEmpty) {
      val base = filtered.getOrElse(c.df)
      val empty = base.filter(lit(false))
        .withColumn(ScoreCol, lit(0.0)).withColumn(SecondaryCol, lit(0.0))
      return if (keepSecondary) empty else empty.drop(SecondaryCol)
    }

    val fused: DataFrame = legs match {
      case Seq((df, w, name)) =>
        // pure-leg degenerate case: weighted raw score; the explain fragment
        // still renders the fusion's normalized contribution
        // (FusionRelativeScore runs even over one set)
        val wnd = BoundedWindow.all()
        val mn = min(col("__s")).over(wnd); val mx = max(col("__s")).over(wnd)
        val norm = when(mx === mn, lit(w)).otherwise((col("__s") - mn) / (mx - mn) * w)
        df.withColumn(ExplainCol, concat(lit("\n"),
            format_string(s"Hybrid (Result Set $name) Document %s: " +
              "original score %s, normalized score: %s",
              col(id).cast("string"), goNum(col("__s")), goNum(norm))))
          .withColumn(ScoreCol, col("__s") * w)
          .withColumn(SecondaryCol, col("__s")).drop("__s")
      case many => fuseMany(many, id, params.fusionType)
    }

    val ranked = fused
      .orderBy(rankOrder(id): _*)
      .limit(limit)
    // decorate back with the collection's columns (ids are unique)
    val decorated = ranked.join(filtered.getOrElse(c.df), Seq(id), "inner")
      .orderBy(rankOrder(id): _*)
    if (keepSecondary) decorated else decorated.drop(SecondaryCol)
  }

  /**
   * Fuse two scored legs on the id column (the classic alpha-weighted shape;
   * delegates to fuseMany with legs ordered sparse-then-dense).
   */
  def fuse(
      sparse: DataFrame, dense: DataFrame, id: String,
      fusion: FusionType, wSparse: Double, wDense: Double): DataFrame =
    fuseMany(Seq(
      (sparse.withColumnRenamed("__s_sparse", "__s"), wSparse, "keyword"),
      (dense.withColumnRenamed("__s_dense", "__s"), wDense, "vector")), id, fusion)

  /**
   * Fuse N weighted legs on the id column — each leg df is (id, __s) with a
   * similarity-like score (higher = better), already bounded to its top-N
   * frame (so every window below runs over ≤ fetchN rows).
   * rankedFusion: score = Σ w_leg / (60 + rank_leg)  (hybrid_fusion.go:22-81)
   * relativeScore: min-max normalize each leg to [0,1], weighted sum
   * (hybrid_fusion.go:93-182; default since 1.24).
   * SecondaryCol carries the first non-null raw leg score in leg order for
   * tie-breaking (hybrid_fusion.go:68-79 SecondarySortValue).
   */
  def fuseMany(legs: Seq[(DataFrame, Double, String)], id: String, fusion: FusionType): DataFrame = {
    require(legs.size >= 2, "fuseMany needs at least two legs")
    // ONE plan for all legs (guide §2.4 — remove shuffles outright): tag each
    // (already top-N-bounded) leg with its index, union, rank/normalize with
    // a single window PARTITIONED BY the leg tag, then pivot back to per-leg
    // columns with one id-keyed hash aggregate. The previous shape — one
    // single-partition window exchange PER LEG feeding a chain of full-outer
    // SortMergeJoins (2 exchanges + 2 sorts each; full-outer cannot
    // broadcast) — paid ~3N-1 exchanges for frames of ≤fetchN rows. This
    // shape pays 2 (window hash + aggregate hash) for any leg count.
    // Per-id equivalence: every leg carries unique ids (each is a top-N over
    // an id-unique collection frame), so max(when(__leg = i, x)) recovers
    // exactly the full-outer join's per-leg cell — the value when leg i
    // returned the id, null otherwise. Ranks/normals are computed per leg
    // partition, identical to the per-leg windows they replace.
    val tagged = legs.zipWithIndex.map { case ((df, _, _), i) =>
      df.select(col(id), col("__s"), lit(i).as("__leg"))
    }.reduce(_.unionByName(_))
    val wLeg = Window.partitionBy(col("__leg"))
    val (metric, mName) = fusion match {
      case FusionType.Ranked =>
        (tagged.withColumn("__m",
          row_number().over(wLeg.orderBy(col("__s").desc, col(id).asc))), "__r")
      case FusionType.RelativeScore =>
        val mn = min(col("__s")).over(wLeg); val mx = max(col("__s")).over(wLeg)
        (tagged.withColumn("__m",
          when(mx === mn, lit(1.0)).otherwise((col("__s") - mn) / (mx - mn))), "__n")
    }
    val aggs: Seq[Column] =
      legs.indices.map(i => max(when(col("__leg") === i, col("__s"))).as(s"__s_$i")) ++
      legs.indices.map(i => max(when(col("__leg") === i, col("__m"))).as(s"${mName}_$i"))
    val joined = metric.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
    val score: Column = fusion match {
      case FusionType.Ranked =>
        legs.indices.map(i =>
          coalesce(lit(legs(i)._2) / (lit(RrfK) + col(s"__r_$i")), lit(0.0))).reduce(_ + _)
      case FusionType.RelativeScore =>
        legs.indices.map(i =>
          coalesce(col(s"__n_$i") * legs(i)._2, lit(0.0))).reduce(_ + _)
    }
    val rankCols = fusion match {
      case FusionType.Ranked        => legs.indices.map(i => s"__r_$i")
      case FusionType.RelativeScore => legs.indices.map(i => s"__n_$i")
    }
    // per-result explain fragments, exactly the fusion's own wording:
    // ranked — "... contributed <w/(60+rank)> to the score", fragments in
    // LEG order each behind a newline (hybrid_fusion.go:40-48);
    // relativeScore — "... original score <raw>, normalized score:
    // <weighted-normalized>", fragments in REVERSE leg order joined by
    // " - " with each behind a newline (hybrid_fusion.go:136-144)
    val explain: Column = fusion match {
      case FusionType.Ranked =>
        concat(legs.indices.map { i =>
          val frag = format_string(
            s"Hybrid (Result Set ${legs(i)._3}) Document %s contributed %s to the score",
            col(id).cast("string"), goNum(lit(legs(i)._2) / (lit(RrfK) + col(s"__r_$i"))))
          coalesce(when(col(s"__r_$i").isNotNull, concat(lit("\n"), frag)), lit(""))
        }: _*)
      case FusionType.RelativeScore =>
        concat_ws(" - ", legs.indices.reverse.map { i =>
          when(col(s"__s_$i").isNotNull, concat(lit("\n"), format_string(
            s"Hybrid (Result Set ${legs(i)._3}) Document %s: " +
              "original score %s, normalized score: %s",
            col(id).cast("string"), goNum(col(s"__s_$i")),
            goNum(col(s"__n_$i") * legs(i)._2))))
        }: _*)
    }
    joined.withColumn(ScoreCol, score)
      .withColumn(SecondaryCol, coalesce(legs.indices.map(i => col(s"__s_$i")): _*))
      .withColumn(ExplainCol, explain)
      .drop((rankCols ++ legs.indices.map(i => s"__s_$i")): _*)
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
    val w = BoundedWindow.ordered(scoreCol.desc, id.asc)
    val wAll = BoundedWindow.orderedAll(scoreCol.desc, id.asc)
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
