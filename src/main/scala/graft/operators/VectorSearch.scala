package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Collection
import org.apache.spark.sql.graft.VectorFunctions
import graft.model._

/**
 * nearVector / nearObject execution (reference: shard_read.go:612-796;
 * params entities/searchparams/retrieval.go:33-39).
 *
 * Spark-first design: the brute-force scan is a codegen'd distance expression
 * over the vector column followed by `ORDER BY dist LIMIT k`, which Spark
 * executes as TakeOrderedAndProject — per-partition bounded heaps, only
 * k rows per partition cross the final exchange. That is exactly the
 * shard-fanout + merge topology of the reference (index.go:2342-2436) and it
 * scales linearly with executors. Index-accelerated probing (IVF) lives in
 * graft.ann and is chosen by the planner when the collection has an index
 * table (the analogue of the reference's flatSearchCutoff decision,
 * entities/vectorindex/hnsw/config.go:34-39).
 */
object VectorSearch {

  val DistanceCol = "_distance"
  val CertaintyCol = "_certainty"

  /** Score a frame with a distance column for one query vector. */
  def withDistance(
      df: DataFrame,
      vectorCol: String,
      query: Array[Float],
      metric: Metric,
      outCol: String = DistanceCol): DataFrame = {
    val qLit = lit(query).cast("array<float>")
    df.withColumn(outCol, VectorFunctions.distance(metric)(col(vectorCol), qLit))
  }

  /** Distance column for one target-position query: Single → the metric
   * kernel, Multi → MaxSim late interaction against the position's
   * multi-vector column (a mixed-position multi-target search scores each
   * position with its own kernel, exactly like the reference's per-target
   * index searches — shard_read.go:655-698). */
  def withDistanceQ(
      df: DataFrame,
      vectorCol: String,
      query: TargetQuery,
      metric: Metric,
      outCol: String = DistanceCol): DataFrame = query match {
    case TargetQuery.Single(v) => withDistance(df, vectorCol, v, metric, outCol)
    case TargetQuery.Multi(vs) =>
      val qLit = typedLit(vs.map(_.toSeq).toSeq)
      df.withColumn(outCol, VectorFunctions.maxSim(qLit, col(vectorCol)))
  }

  /**
   * Full nearVector over a collection: multi-target combination, threshold,
   * deterministic top-k (ties broken by id — matches the reference's uuid
   * tie-break in shard_combine_multi_target.go:85-88).
   * limit None => SearchByVectorDistance semantics (unlimited, threshold only,
   * reference: shard_read.go:674-700).
   */
  def nearVector(
      c: Collection,
      params: NearVector,
      metric: Metric,
      limit: Option[Int],
      filtered: Option[DataFrame] = None): DataFrame = {
    val base = filtered.getOrElse(c.df)
    val targets: Seq[String] =
      if (params.targetVectors.nonEmpty) params.targetVectors
      else Seq(c.schema.defaultVector.getOrElse(c.schema.vectors.keys.head))

    params.combination match {
      case TargetCombination.RelativeScore(ws) if targets.size > 1 =>
        return relativeScoreSearch(c, base, targets, ws, params, metric, limit)
      case _ => ()
    }

    val scored =
      if (targets.size == 1) {
        // vectorColumn (not a raw Map apply): an unknown/dropped target must
        // raise the engine's "has no vector named" error, not a key miss
        withDistanceQ(base, c.schema.vectorColumn(Some(targets.head)),
          params.targetQuery(0), metric)
      } else {
        // multi-target: one distance column per target, then combine
        // (reference: shard_read.go:655-752, CombineMultiTargetResults).
        // Scoring every row exactly (instead of the reference's union-of-
        // candidate-lists + backfill) is the stronger guarantee the full scan
        // affords — same formula, no candidate-generation misses.
        val perTarget = foldDistances(base, c, targets, params, metric)
        perTarget.withColumn(DistanceCol, standardCombineCol(targets, params.combination))
          .drop(targets.indices.map(i => s"__d$i"): _*)
      }

    val threshold: Option[Double] =
      params.distance.orElse(params.certainty.map(ct => 2.0 * (1.0 - ct))) // certainty = 1 - d/2
    val cut = threshold.map(t => scored.filter(col(DistanceCol) <= t)).getOrElse(scored)
    limit match {
      case Some(k) => cut.orderBy(col(DistanceCol).asc, col(c.schema.idColumn).asc).limit(k)
      case None    => cut.orderBy(col(DistanceCol).asc, col(c.schema.idColumn).asc)
    }
  }

  /** One exact distance column per target: `__d0..__dn` over `base`,
   * each scored with that target's own query vector (params.queryFor). */
  private def foldDistances(base: DataFrame, c: Collection, targets: Seq[String],
      params: NearVector, metric: Metric): DataFrame =
    targets.zipWithIndex.foldLeft(base) { case (d, (t, i)) =>
      withDistanceQ(d, c.schema.vectorColumn(Some(t)), params.targetQuery(i),
        metric, s"__d$i")
    }

  /** Combined-distance column over `__d{i}` for the non-pool combinations
   * (reference: ResultContainerStandard.AddScores weights — Min takes the
   * best list entry, Sum/Avg/Manual are weighted sums). */
  private def standardCombineCol(targets: Seq[String], combination: TargetCombination): Column = {
    val dcols = targets.indices.map(i => col(s"__d$i"))
    combination match {
      case TargetCombination.Minimum => dcols.reduce((a, b) => least(a, b))
      case TargetCombination.Sum     => dcols.reduce(_ + _)
      case TargetCombination.Average => dcols.reduce(_ + _) / dcols.size
      case TargetCombination.ManualWeights(ws) =>
        targets.indices.map(i => col(s"__d$i") * lit(ws.lift(i).getOrElse(1.0))).reduce(_ + _)
      case TargetCombination.RelativeScore(_) =>
        throw new IllegalStateException(
          "unreachable: multi-target RelativeScore fuses over a candidate pool")
    }
  }

  /**
   * Exact combination over an EXPLICIT candidate pool — the backfill+combine
   * step of the reference's CombineMultiTargetResults
   * (shard_combine_multi_target.go:89-260): every pool member gets its exact
   * distance for EVERY target, the combination runs over the pool only, and
   * ranking truncates to the limit. Used by the per-target-index search arm
   * (IvfIndex.multiTargetSearch), whose pool is the union of per-target
   * candidate lists; the pool rows come from the index layout and carry all
   * vector columns, so "backfill" is a codegen'd distance column — no
   * re-fetch of the collection (the reference pays VectorDistanceForQuery
   * per missing id instead). RelativeScore min-max normalizes each target
   * over this pool, mirroring the reference's backfilled fusionInput (every
   * pool id appears in every target's list before FusionRelativeScore runs).
   */
  def combineOverPool(c: Collection, pool: DataFrame, targets: Seq[String],
      params: NearVector, limit: Option[Int]): DataFrame = {
    val withD = foldDistances(pool, c, targets, params, params.metric)
    params.combination match {
      case TargetCombination.RelativeScore(ws) =>
        fuseRelative(c, withD, targets, ws, params, limit)
      case comb =>
        val scored = withD.withColumn(DistanceCol, standardCombineCol(targets, comb))
          .drop(targets.indices.map(i => s"__d$i"): _*)
        val threshold: Option[Double] =
          params.distance.orElse(params.certainty.map(ct => 2.0 * (1.0 - ct)))
        val cut = threshold.map(t => scored.filter(col(DistanceCol) <= t)).getOrElse(scored)
        limit match {
          case Some(k) => cut.orderBy(col(DistanceCol).asc, col(c.schema.idColumn).asc).limit(k)
          case None    => cut.orderBy(col(DistanceCol).asc, col(c.schema.idColumn).asc)
        }
    }
  }

  /**
   * RelativeScore multi-target combination, reference-faithful
   * (shard_combine_multi_target.go:118-183 + hybrid_fusion.go:93-150): the
   * candidate pool is the UNION of per-target bounded top-k lists, every pool
   * member gets its exact distance for every target (the reference back-fills
   * missing ids via VectorDistanceForQuery), each target min-max normalizes
   * over that bounded pool, and the weighted sum ranks ascending. Degenerate
   * per-target range (max == min) contributes the bare weight
   * (hybrid_fusion.go:133-136).
   *
   * Scale shape: per-target top-k are parallel TakeOrderedAndProject scans
   * (k rows per partition cross the exchange); pool min/max is a partial
   * aggregate broadcast back — NO unpartitioned window anywhere, unlike the
   * naive min().over() formulation this replaces.
   */
  private def relativeScoreSearch(
      c: Collection, base: DataFrame, targets: Seq[String], ws: Seq[Double],
      params: NearVector, metric: Metric, limit: Option[Int]): DataFrame = {
    val id = c.schema.idColumn
    val scoredAll = foldDistances(base, c, targets, params, metric)
    val pool = limit match {
      case Some(k) =>
        val ids = targets.indices.map { i =>
          scoredAll.orderBy(col(s"__d$i").asc, col(id).asc).limit(k).select(col(id))
        }.reduce(_ unionByName _).distinct()
        scoredAll.join(broadcast(ids), Seq(id), "left_semi")
      case None => scoredAll // unlimited: the pool is the whole collection
    }
    fuseRelative(c, pool, targets, ws, params, limit)
  }

  /** RelativeScore fuse over a pool that already carries `__d{i}` columns:
   * per-target min-max over the pool (partial aggregate broadcast back),
   * weighted sum, ascending rank. Degenerate per-target range (max == min)
   * contributes the bare weight (hybrid_fusion.go:133-136). Shared by the
   * full-scan pool (relativeScoreSearch) and the index-probe pool
   * (combineOverPool). */
  private def fuseRelative(c: Collection, pool: DataFrame, targets: Seq[String],
      ws: Seq[Double], params: NearVector, limit: Option[Int]): DataFrame = {
    val id = c.schema.idColumn
    val aggs = targets.indices.flatMap(i =>
      Seq(min(col(s"__d$i")).as(s"__mn$i"), max(col(s"__d$i")).as(s"__mx$i")))
    val stats = pool.agg(aggs.head, aggs.tail: _*)
    val combined = targets.indices.map { i =>
      val d = col(s"__d$i"); val mn = col(s"__mn$i"); val mx = col(s"__mx$i")
      val w = lit(ws.lift(i).getOrElse(1.0))
      when(mx === mn, w).otherwise((d - mn) / (mx - mn) * w)
    }.reduce(_ + _)
    val fused = pool.crossJoin(broadcast(stats))
      .withColumn(DistanceCol, combined)
      .drop(targets.indices.flatMap(i => Seq(s"__d$i", s"__mn$i", s"__mx$i")): _*)
    val threshold: Option[Double] =
      params.distance.orElse(params.certainty.map(ct => 2.0 * (1.0 - ct)))
    val cut = threshold.map(t => fused.filter(col(DistanceCol) <= t)).getOrElse(fused)
    limit match {
      case Some(k) => cut.orderBy(col(DistanceCol).asc, col(id).asc).limit(k)
      case None    => cut.orderBy(col(DistanceCol).asc, col(id).asc)
    }
  }

  /**
   * Multi-vector (ColBERT) search: MaxSim late interaction between the query
   * token bag and the document's `array<array<float>>` named vector
   * (reference: shard_read.go:687-698, vector/multivector/). Same scan +
   * TakeOrderedAndProject shape as nearVector — the MaxSim kernel is a
   * codegen'd expression, so the token×token loop stays in-stage.
   */
  def nearMultiVector(
      c: Collection,
      params: NearMultiVector,
      limit: Option[Int],
      filtered: Option[DataFrame] = None): DataFrame = {
    val base = filtered.getOrElse(c.df)
    val vecCol = c.schema.vectorColumn(params.targetVectors.headOption)
    val qLit = typedLit(params.vectors.map(_.toSeq).toSeq)
    val scored = base.withColumn(DistanceCol,
      org.apache.spark.sql.graft.VectorFunctions.maxSim(qLit, col(vecCol)))
    limit match {
      case Some(k) => scored.orderBy(col(DistanceCol).asc, col(c.schema.idColumn).asc).limit(k)
      case None    => scored.orderBy(col(DistanceCol).asc, col(c.schema.idColumn).asc)
    }
  }

  /** Resolve a nearObject to a nearVector by looking up the anchor object's
   * vector (reference: retrieval.go:128-135, near_params_vector.go). */
  def resolveNearObject(c: Collection, params: NearObject): NearVector = {
    val vecCol = c.schema.vectorColumn(params.targetVectors.headOption)
    val anchor = c.df.filter(col(c.schema.idColumn) === lit(params.id))
      .select(col(vecCol)).head(1)
    require(anchor.nonEmpty, s"nearObject: id ${params.id} not found in ${c.name}")
    NearVector(anchor.head.getSeq[Float](0).toArray, params.metric,
      params.distance, params.certainty, params.targetVectors)
  }

  /** nearObject: anchor lookup then nearVector. */
  def nearObject(
      c: Collection,
      params: NearObject,
      metric: Metric,
      limit: Option[Int],
      filtered: Option[DataFrame] = None): DataFrame =
    nearVector(c, resolveNearObject(c, params), metric, limit, filtered)
}
