package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Collection
import graft.model.{SearchOperator, Tokenization}
import graft.text.Tokenize

/**
 * Materialized BM25 postings — the batch-built side table replacing the
 * reference's LSM inverted index (adapters/repos/db/inverted; term stats
 * inverted/terms/terms.go; prop-length tracker inverted/prop_length_tracker.go).
 *
 * `Bm25Search` scans and tokenizes the collection per query — right for
 * ad-hoc queries. For query-heavy workloads the postings table amortizes
 * tokenization once: one explode + groupBy at build time, then each query is
 * a pushdown-filtered read of a few term partitions joined back to doc
 * lengths. At 100 TB the postings table is partitioned/bucketed by term, so
 * a query reads only its terms' partitions — the Spark analogue of fetching
 * posting lists, with the same scoring math to the last bit.
 *
 * Multi-prop (BM25F) support mirrors the scan path: per-(term, doc, prop)
 * term frequencies, per-prop length norms, idf over the UNION doc frequency
 * (a doc counts once per term regardless of which prop contains it —
 * `Bm25Search.corpusStats` builds the identical dictionary).
 *
 * Block-max metadata stores (max_tf, min_dl) per (term, bucket, prop) rather
 * than a pre-saturated impact: tf-saturation is increasing in tf and
 * decreasing in dl, so sat(max_tf, min_dl) bounds every doc's contribution
 * for ANY query-time (k1, b) and ANY avgLen — which keeps pruning sound both
 * for non-default k1/b queries and after incremental appends shift avgLen
 * (the reference's per-block impact stats are rebuilt by segment compaction
 * instead, terms/terms_block.go).
 */
final case class PostingsIndex(
    props: Seq[String],
    tokenizations: Seq[Tokenization],
    postings: DataFrame,   // (term, __id, __p, tf, __bucket)
    docLens: DataFrame,    // (__id, __dl_0 … __dl_{P-1})
    termDf: DataFrame,     // (term, df) — union doc frequency (BM25F idf)
    maxImpact: DataFrame,  // (term, __bucket, __p, max_tf, min_dl)
    nDocs: Long,
    avgLens: IndexedSeq[Double],
    idCol: String,
    buckets: Int,
    /** Identity of the corpus DataFrame the index was built from — the store
     * version gate: the engine serves from the index only while the
     * collection still exposes the same df (mirrors `Bm25Search.statsCache`'s
     * df-identity key). */
    storeId: Int)

object Postings {

  /** Build a postings index over one or more searchable text properties.
   * With `persistPath` the postings land as parquet partitioned by __bucket
   * and term-sorted within files — block-max pruning then IS parquet
   * partition pruning, and the per-term filter skips row groups via min/max
   * stats (the warehouse-scale layout, like IvfIndex's partition-per-
   * centroid). Without it the side tables persist in memory (tests,
   * interactive sessions). */
  def build(c: Collection, props: Seq[String], buckets: Int,
            persistPath: Option[String]): PostingsIndex = {
    require(props.nonEmpty, "postings: at least one property")
    val toks = tokenize(c, props)
    val rawPost = postingsOf(toks, props).withColumn("__bucket",
      pmod(xxhash64(col("__id")), lit(buckets)).cast("int"))
    val rawLens = docLensOf(toks, props)
    val (post, lens) = persistPath match {
      case Some(p) =>
        rawPost.repartition(col("__bucket")).sortWithinPartitions("term")
          .write.mode("overwrite").partitionBy("__bucket").parquet(s"$p/postings")
        rawLens.write.mode("overwrite").parquet(s"$p/docLens")
        val ss = c.df.sparkSession
        (ss.read.parquet(s"$p/postings"), ss.read.parquet(s"$p/docLens"))
      case None => (rawPost.cache(), rawLens.cache())
    }
    assemble(c, props, buckets, post, lens)
  }

  def build(c: Collection, props: Seq[String], buckets: Int): PostingsIndex =
    build(c, props, buckets, None)

  def build(c: Collection, prop: String, buckets: Int = 64): PostingsIndex =
    build(c, Seq(prop), buckets)

  def build(c: Collection, props: Seq[String]): PostingsIndex =
    build(c, props, 64)

  /**
   * Incremental maintenance (the reference's async indexing queue analogue,
   * like `IvfIndex.append`): apply an upsert/delete delta without
   * re-tokenizing the standing corpus. Only the CHANGED rows are tokenized;
   * the statistics tables (termDf, maxImpact, N, avgLen) are re-aggregated
   * from the merged postings/docLens side tables — far smaller than the raw
   * text at any scale, and the only sound option for df/max/min under
   * replaced or deleted docs. Lineage is truncated per delta
   * (localCheckpoint) so a long-lived session applying many deltas doesn't
   * grow an ever-deeper plan.
   *
   * @param c        the collection AFTER the mutation (its df identity
   *                 becomes the new storeId, so the engine routes again)
   * @param changed  full rows of upserted (new or replaced) objects
   * @param removedIds ids of deleted objects (replaced ids need not be listed)
   */
  def delta(idx: PostingsIndex, c: Collection, changed: DataFrame,
            removedIds: Option[DataFrame] = None): PostingsIndex = {
    // collapse duplicate ids within the batch (an at-least-once stream can
    // carry two versions of a doc): without this, tf would SUM across both
    // versions and docLens would fan out the scoring join. Which duplicate
    // wins is arbitrary on an unordered DataFrame — collapse upstream
    // (e.g. IndexMaintenance.startPostings materializes one winner for both
    // the store and the index) when last-write-wins matters.
    val changedU = changed.dropDuplicates(idx.idCol)
    val goneIds = {
      val ch = changedU.select(col(idx.idCol).as("__id"))
      removedIds.map(r => ch.unionByName(r.select(col(idx.idCol).as("__id")))).getOrElse(ch)
    }
    val newToks = tokenize(Collection(c.schema, changedU), idx.props)
    val mergedPostings = idx.postings
      .join(goneIds, Seq("__id"), "left_anti")
      .unionByName(postingsOf(newToks, idx.props).withColumn("__bucket",
        pmod(xxhash64(col("__id")), lit(idx.buckets)).cast("int")), allowMissingColumns = true)
      .localCheckpoint()
    val mergedLens = idx.docLens
      .join(goneIds, Seq("__id"), "left_anti")
      .unionByName(docLensOf(newToks, idx.props))
      .localCheckpoint()
    idx.postings.unpersist(); idx.docLens.unpersist()
    idx.termDf.unpersist(); idx.maxImpact.unpersist()
    assemble(c, idx.props, idx.buckets, mergedPostings, mergedLens)
  }

  private def tokenize(c: Collection, props: Seq[String]): DataFrame = {
    val id = c.schema.idColumn
    val modes = props.map(p => c.schema.property(p).map(_.tokenization).getOrElse(Tokenization.Word))
    c.df.select(col(id).as("__id") +: props.zip(modes).zipWithIndex.map {
      case ((p, m), i) => Tokenize(m)(col(p)).as(s"__toks_$i")
    }: _*)
  }

  private def docLensOf(toks: DataFrame, props: Seq[String]): DataFrame =
    toks.select(col("__id") +: props.indices.map(i =>
      size(col(s"__toks_$i")).cast("double").as(s"__dl_$i")): _*)

  /** (term, __id, __p, tf) without the bucket column. */
  private def postingsOf(toks: DataFrame, props: Seq[String]): DataFrame =
    props.indices.map { i =>
      toks.select(col("__id"), lit(i).as("__p"), explode(col(s"__toks_$i")).as("term"))
    }.reduce(_.unionByName(_))
      .groupBy(col("term"), col("__id"), col("__p"))
      .agg(count(lit(1)).cast("double").as("tf"))

  /** Stats + block-max aggregation over prepared postings/docLens frames.
   * `postings` may or may not already carry __bucket (build adds it here;
   * delta merges pre-bucketed rows). */
  private def assemble(c: Collection, props: Seq[String], buckets: Int,
                       postings0: DataFrame, docLens: DataFrame): PostingsIndex = {
    val postings =
      if (postings0.columns.contains("__bucket")) postings0
      else postings0.withColumn("__bucket",
        pmod(xxhash64(col("__id")), lit(buckets)).cast("int")).cache()
    val statAggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++ props.indices.map(i => avg(col(s"__dl_$i")).as(s"avg_$i"))
    val statRow = docLens.agg(statAggs.head, statAggs.tail: _*).head()
    val nDocs = statRow.getAs[Long]("n")
    // same epsilon floor as Bm25Search.corpusStats — parity to the last bit
    val avgLens = props.indices.map(i =>
      math.max(Option(statRow.getAs[java.lang.Double](s"avg_$i")).map(_.toDouble).getOrElse(0.0), 1e-9))
      .toIndexedSeq
    val termDf = postings.groupBy(col("term"))
      .agg(countDistinct(col("__id")).cast("double").as("df")).cache()
    val dlOfProp = props.indices.foldLeft(lit(null).cast("double")) { (acc, i) =>
      when(col("__p") === i, col(s"__dl_$i")).otherwise(acc)
    }
    val maxImpact = postings.join(docLens, "__id")
      .groupBy(col("term"), col("__bucket"), col("__p"))
      .agg(max(col("tf")).as("max_tf"), min(dlOfProp).as("min_dl"))
      .cache()
    val modes = props.map(p => c.schema.property(p).map(_.tokenization).getOrElse(Tokenization.Word))
    PostingsIndex(props, modes, postings, docLens, termDf, maxImpact,
      nDocs, avgLens, c.schema.idColumn, buckets,
      System.identityHashCode(c.df))
  }

  // --- query-time shared pieces ---------------------------------------------

  /** `activeProps` = indices (into idx.props) of the props this query scores —
   * the reference's per-property posting lists: ONE index over all searchable
   * props serves any scored subset (bm25 `properties:`), because df/tf/len
   * stats restrict to the subset at query time. */
  private final case class QueryCtx(
      terms: Seq[String], idf: Map[String, Double], minMatch: Int,
      activeProps: Seq[Int])

  private def ctx(idx: PostingsIndex, query: String, op: SearchOperator,
                  props: Option[Seq[String]]): QueryCtx = {
    val active: Seq[Int] = props match {
      case None => idx.props.indices
      case Some(ps) =>
        val missing = ps.filterNot(idx.props.contains)
        require(missing.isEmpty, s"postings: props not in index: ${missing.mkString(",")}")
        ps.map(idx.props.indexOf)
    }
    val terms = active.map(idx.tokenizations)
      .flatMap(m => Tokenize.queryTokens(m, query)).distinct
    require(terms.nonEmpty, "bm25: empty query after tokenization")
    // doc frequency over the scored prop set (BM25F union-df). The full set
    // reads the precomputed dictionary; a subset re-aggregates from the
    // term-pruned postings — a job over only the query terms' posting rows,
    // the same work the dictionary lookup does plus one tiny shuffle.
    val dfs: Map[String, Double] = (if (active == idx.props.indices) {
      idx.termDf.filter(col("term").isin(terms: _*))
    } else {
      idx.postings
        .filter(col("term").isin(terms: _*) && col("__p").isin(active: _*))
        .groupBy(col("term")).agg(countDistinct(col("__id")).cast("double").as("df"))
    }).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val idf = terms.map { t =>
      val n = dfs.getOrElse(t, 0.0)
      t -> math.log(1.0 + (idx.nDocs - n + 0.5) / (n + 0.5))
    }.toMap
    val minMatch = op match {
      case SearchOperator.AndOp => terms.size
      case SearchOperator.Or(m) => math.max(1, m)
    }
    QueryCtx(terms, idf, minMatch, active)
  }

  /** Per-doc scores over a (possibly bucket-restricted) postings subset:
   * (__id, _score) after the minimum-should-match filter. */
  private def scored(idx: PostingsIndex, q: QueryCtx, k1: Double, b: Double,
                     allowlist: Option[DataFrame], boosts: Map[String, Double],
                     bucketFilter: Option[Seq[Int]]): DataFrame = {
    val idfCol = q.terms.foldLeft(lit(0.0)) { (acc, t) =>
      when(col("term") === t, lit(q.idf(t))).otherwise(acc)
    }
    val satCol = q.activeProps.foldLeft(lit(0.0)) { (acc, p) =>
      val boost = boosts.getOrElse(idx.props(p), 1.0)
      when(col("__p") === p,
        lit(boost) * col("tf") / (col("tf") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col(s"__dl_$p") / lit(idx.avgLens(p)))))
        .otherwise(acc)
    }
    val baseP =
      if (q.activeProps == idx.props.indices) idx.postings
      else idx.postings.filter(col("__p").isin(q.activeProps: _*))
    val base0 = baseP.filter(col("term").isin(q.terms: _*))
    val base1 = bucketFilter.map(bs => base0.filter(col("__bucket").isin(bs: _*))).getOrElse(base0)
    // where-filter = allowlist before scoring (reference shard_read.go:536-550)
    val base = allowlist match {
      case Some(ids) => base1.join(
        ids.select(col(idx.idCol).as("__id")), Seq("__id"), "left_semi")
      case None => base1
    }
    base.join(idx.docLens, "__id")
      .withColumn("__contrib", idfCol * satCol)
      .groupBy(col("__id"))
      .agg(sum(col("__contrib")).as(Bm25Search.ScoreCol),
        countDistinct(col("term")).as("__matched"))
      .filter(col("__matched") >= q.minMatch)
      .drop("__matched")
  }

  /** BM25 scoring over the postings table — identical math to Bm25Search
   * (idf = ln(1+(N−n+0.5)/(n+0.5)); tf saturation with k1/b).
   *
   * Fully LAZY: unlike `searchPruned` (whose θ phase must materialize), this
   * builds ONE plan — the per-term doc frequency joins in from the (tiny,
   * broadcast) dictionary and idf is computed in the plan, so no driver jobs
   * run at construction time and the search composes into larger DAGs
   * (hybrid legs run inside one job instead of serializing driver phases).
   * `Math.log` backs both the literal and codegen paths, so scores stay
   * bit-identical to the scan path. */
  def search(idx: PostingsIndex, query: String, limit: Int,
             searchOperator: SearchOperator = SearchOperator.Or(1),
             k1: Double = 1.2, b: Double = 0.75,
             allowlist: Option[DataFrame] = None,
             boosts: Map[String, Double] = Map.empty,
             props: Option[Seq[String]] = None): DataFrame = {
    val active: Seq[Int] = props match {
      case None => idx.props.indices
      case Some(ps) =>
        val missing = ps.filterNot(idx.props.contains)
        require(missing.isEmpty, s"postings: props not in index: ${missing.mkString(",")}")
        ps.map(idx.props.indexOf)
    }
    val terms = active.map(idx.tokenizations)
      .flatMap(m => Tokenize.queryTokens(m, query)).distinct
    require(terms.nonEmpty, "bm25: empty query after tokenization")
    val minMatch = searchOperator match {
      case SearchOperator.AndOp => terms.size
      case SearchOperator.Or(m) => math.max(1, m)
    }
    // per-term df over the scored prop set: the precomputed dictionary for
    // the full set, a term-pruned re-aggregation for a subset — either way a
    // ≤|terms|-row frame, broadcast onto the postings rows
    val dfTbl =
      if (active == idx.props.indices) idx.termDf.filter(col("term").isin(terms: _*))
      else idx.postings
        .filter(col("term").isin(terms: _*) && col("__p").isin(active: _*))
        .groupBy(col("term")).agg(countDistinct(col("__id")).cast("double").as("df"))
    val idfCol = log(lit(1.0) +
      (lit(idx.nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val satCol = active.foldLeft(lit(0.0)) { (acc, p) =>
      val boost = boosts.getOrElse(idx.props(p), 1.0)
      when(col("__p") === p,
        lit(boost) * col("tf") / (col("tf") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col(s"__dl_$p") / lit(idx.avgLens(p)))))
        .otherwise(acc)
    }
    val baseP =
      if (active == idx.props.indices) idx.postings
      else idx.postings.filter(col("__p").isin(active: _*))
    val base0 = baseP.filter(col("term").isin(terms: _*))
    val base = allowlist match {
      case Some(ids) => base0.join(
        ids.select(col(idx.idCol).as("__id")), Seq("__id"), "left_semi")
      case None => base0
    }
    base.join(broadcast(dfTbl), "term")
      .join(idx.docLens, "__id")
      .withColumn("__contrib", idfCol * satCol)
      .groupBy(col("__id"))
      .agg(sum(col("__contrib")).as(Bm25Search.ScoreCol),
        countDistinct(col("term")).as("__matched"))
      .filter(col("__matched") >= minMatch)
      .drop("__matched")
      .withColumnRenamed("__id", idx.idCol)
      .orderBy(col(Bm25Search.ScoreCol).desc, col(idx.idCol).asc)
      .limit(limit)
  }

  /**
   * BlockMax-WAND-style pruned top-k (the Spark shape of the reference's
   * default BM25 execution, bm25_searcher_block.go / terms_block.go; SURVEY
   * §4 "per-partition max-score stats → partition pruning before TopK").
   *
   * Exactness argument: θ is the kth exact score within the single
   * best-bounded bucket — a lower bound of the global kth score (an
   * allowlist or minimum-should-match filter only REMOVES candidates from
   * both phases equally, so θ stays a lower bound of the final kth). A doc
   * in any bucket with upper bound Σ_{t,p} idf_t·boost_p·sat(max_tf, min_dl)
   * < θ scores strictly below θ ≤ global-kth, so pruning that bucket cannot
   * evict a true top-k member (strict inequality also survives ties). At
   * 100 TB the bucket is a physical partition of the postings layout, so
   * pruning skips whole partitions of every term's posting list.
   */
  def searchPruned(idx: PostingsIndex, query: String, limit: Int,
                   searchOperator: SearchOperator = SearchOperator.Or(1),
                   k1: Double = 1.2, b: Double = 0.75,
                   allowlist: Option[DataFrame] = None,
                   boosts: Map[String, Double] = Map.empty,
                   props: Option[Seq[String]] = None): DataFrame = {
    val q = ctx(idx, query, searchOperator, props)

    // driver-side bucket bounds from the (tiny) block-max table
    val bounds: Map[Int, Double] = idx.maxImpact
      .filter(col("term").isin(q.terms: _*) && col("__p").isin(q.activeProps: _*))
      .collect()
      .groupBy(_.getInt(1))
      .map { case (bkt, rows) =>
        bkt -> rows.map { r =>
          val p = r.getInt(2)
          val maxTf = r.getDouble(3); val minDl = r.getDouble(4)
          val boost = boosts.getOrElse(idx.props(p), 1.0)
          q.idf(r.getString(0)) * boost *
            maxTf / (maxTf + k1 * ((1.0 - b) + b * minDl / idx.avgLens(p)))
        }.sum
      }
    def finish(d: DataFrame): DataFrame = d
      .withColumnRenamed("__id", idx.idCol)
      .orderBy(col(Bm25Search.ScoreCol).desc, col(idx.idCol).asc)
      .limit(limit)
    if (bounds.isEmpty)
      return finish(scored(idx, q, k1, b, allowlist, boosts, None)).limit(0)

    // phase 1: exact scores in the best-bounded bucket → θ (kth best, or -inf)
    val bestBucket = bounds.maxBy(_._2)._1
    val phase1 = scored(idx, q, k1, b, allowlist, boosts, Some(Seq(bestBucket)))
      .orderBy(col(Bm25Search.ScoreCol).desc).limit(limit)
      .collect().map(_.getDouble(1))
    val theta = if (phase1.length < limit) Double.NegativeInfinity else phase1.min

    // phase 2: scan only buckets whose bound can reach θ
    val survivors = bounds.filter { case (_, bound) => bound >= theta }.keys.toSeq
    finish(scored(idx, q, k1, b, allowlist, boosts, Some(survivors)))
  }
}
