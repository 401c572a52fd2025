package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Collection
import graft.model._
import graft.text.Tokenize

/**
 * BM25 / BM25F keyword ranking (reference: inverted/bm25_searcher.go;
 * scoring math inverted/terms/terms.go:67-72 for idf and :241-249 for tf;
 * defaults k1=1.2 b=0.75 usecases/config/config_handler.go:57-58).
 *
 *   idf(t) = ln(1 + (N - n_t + 0.5) / (n_t + 0.5))
 *   tf(t)  = f / (f + k1 * (1 - b + b * len/avgLen))
 *   score  = Σ_t idf(t) * tf(t) * propBoost
 *
 * Spark-first design: query terms are *literals*, so per-term term-frequency
 * is a codegen'd array expression over the tokenized property — no explode, no
 * shuffle on the docs side. Corpus stats (N, avgLen, per-term doc frequency)
 * are built ONCE per (collection, props) into a cached dictionary side table
 * (see CorpusStats); each query folds its own terms' stats into the scoring
 * expression as literals. Top-k then runs as
 * TakeOrderedAndProject. The reference's WAND/BlockMax pruning
 * (bm25_searcher_block.go) is an inverted-index physical trick; the Spark
 * equivalent at 100 TB is per-partition max-impact stats for partition
 * pruning — at current scale the scan+TopK plan is already shuffle-minimal
 * (only k rows per partition move).
 *
 * For repeated querying at scale, `Postings.build` materializes a postings
 * table (term → doc list with tf) that turns each query into a broadcast
 * semi-join instead of a full scan.
 */
object Bm25Search {

  val ScoreCol = "_score"

  final case class PropSpec(name: String, boost: Double)

  /**
   * Cached corpus statistics for one (collection, scored-props) pair — the
   * Spark analogue of the reference's persistent prop-length tracker + term
   * dictionary (inverted/prop_length_tracker.go, terms/terms.go:67-72).
   * Built ONCE with a single tokenize pass, then every query resolves its few
   * terms' doc-frequencies from the persisted dictionary table instead of
   * re-scanning the corpus. At 100 TB this is the difference between one
   * offline stats build and a full extra scan per query.
   */
  private final case class CorpusStats(n: Double, avgLens: IndexedSeq[Double], termDf: DataFrame)

  // Keyed by (collection name, df identity, scored props): the df identity
  // distinguishes store versions (every CollectionStore.writeVersion produces
  // a new df), the collection name is the eviction handle — writeVersion
  // calls invalidateStats(name) so superseded versions' persisted termDf
  // tables are released instead of leaking for the life of the session.
  private val statsCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Seq[String]), CorpusStats]

  /** Drop cached stats for one collection (called on store mutation). */
  def invalidateStats(collectionName: String): Unit =
    statsCache.filterInPlace { case ((name, _, _), stats) =>
      val keep = name != collectionName
      if (!keep) stats.termDf.unpersist()
      keep
    }

  /** Drop all cached stats (tests). */
  def invalidateStats(): Unit = {
    statsCache.values.foreach(_.termDf.unpersist())
    statsCache.clear()
  }

  /** Visible for the lifecycle spec. */
  private[graft] def cachedStatsKeys: Set[(String, Int, Seq[String])] = statsCache.keySet.toSet

  private def corpusStats(c: Collection, propTok: Seq[(PropSpec, Tokenization)]): CorpusStats = {
    val key = (c.name, System.identityHashCode(c.df), propTok.map { case (s, m) => s"${s.name}:${m.name}" })
    // fast path without a lock; build under a lock because TrieMap's
    // getOrElseUpdate doesn't guarantee single evaluation — two concurrent
    // first queries would both run the stats pass and the loser's persisted
    // termDf would leak for the session
    statsCache.get(key) match {
      case Some(s) => s
      case None => statsCache.synchronized { statsCache.getOrElseUpdate(key, {
      val tokenized = propTok.zipWithIndex.foldLeft(c.df.select(propTok.map { case (s, _) => col(s.name) }: _*)) {
        case (d, ((spec, mode), i)) => d.withColumn(s"__tok_$i", Tokenize(mode)(col(spec.name)))
      }
      val statAggs: Seq[Column] =
        Seq(count(lit(1)).as("N")) ++
        propTok.indices.map(i => avg(size(col(s"__tok_$i"))).as(s"avgLen_$i"))
      val statRow = tokenized.agg(statAggs.head, statAggs.tail: _*).head()
      val n = statRow.getAs[Long]("N").toDouble
      val avgLens = propTok.indices.map(i => math.max(statRow.getAs[Double](s"avgLen_$i"), 1e-9)).toIndexedSeq
      // doc frequency dictionary: docs where ANY scored prop contains the term
      // (BM25F treats the document as one bag for idf). Null token arrays
      // contribute nothing — matching the three-valued || of the scan pass.
      val empty = array().cast("array<string>")
      val docTerms = array_distinct(concat(
        propTok.indices.map(i => coalesce(col(s"__tok_$i"), empty)): _*))
      val termDf = tokenized.select(explode(docTerms).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      CorpusStats(n, avgLens, termDf)
    }) }
    }
  }

  /** Parse "prop^2" boost syntax (reference: searchparams retrieval.go BM25 properties). */
  def parseProps(props: Seq[String]): Seq[PropSpec] = props.map { p =>
    p.split('^') match {
      case Array(n, b) => PropSpec(n, b.toDouble)
      case Array(n)    => PropSpec(n, 1.0)
    }
  }

  /**
   * Score `base` (already where-filtered — reference applies the filter as an
   * allowlist before scoring, shard_read.go:536-550) against the query.
   * Returns rows containing >=1 query term (searchOperator Or) or all terms
   * (And), with `_score`. IDF statistics come from the *unfiltered* collection
   * (matching the reference, whose postings/idf are collection-wide).
   */
  /** Per-term contribution column name for explainScore. */
  def explainCol(term: String): String = s"_exp_$term"

  def score(c: Collection, params: Bm25, base: Option[DataFrame] = None,
            explain: Boolean = false): DataFrame = {
    val df = base.getOrElse(c.df)
    val specs =
      if (params.properties.nonEmpty) parseProps(params.properties)
      else c.schema.properties.filter(p => p.dataType == PropType.Text && p.indexSearchable)
        .map(p => PropSpec(p.name, 1.0))
    require(specs.nonEmpty, s"bm25: no searchable text properties on ${c.name}")

    // per-prop token arrays + per-prop query-token sets under that prop's tokenization
    val propTok: Seq[(PropSpec, Tokenization)] = specs.map { s =>
      s -> c.schema.property(s.name).map(_.tokenization).getOrElse(Tokenization.Word)
    }
    val queryTerms: Seq[String] =
      propTok.flatMap { case (_, mode) => Tokenize.queryTokens(mode, params.query) }.distinct
    require(queryTerms.nonEmpty, "bm25: empty query after tokenization")

    // corpus stats come from the cached per-(collection, props) side tables —
    // no per-query corpus pass; only the query's own terms are looked up.
    val stats = corpusStats(c, propTok)
    val bigN = stats.n
    val avgLen = stats.avgLens
    val dfLookup: Map[String, Double] = stats.termDf
      .filter(col("term").isin(queryTerms: _*))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val docFreq = queryTerms.map(t => dfLookup.getOrElse(t, 0.0))

    val scoredBase = propTok.zipWithIndex.foldLeft(df) { case (d, ((spec, mode), i)) =>
      d.withColumn(s"__tok_$i", Tokenize(mode)(col(spec.name)))
    }

    def termFreq(i: Int, t: String): Column =
      size(filter(col(s"__tok_$i"), x => x === lit(t))).cast("double")

    val perTermScore: Seq[Column] = queryTerms.zipWithIndex.map { case (t, ti) =>
      val n = docFreq(ti)
      val idf = math.log(1.0 + (bigN - n + 0.5) / (n + 0.5))
      val perProp = propTok.zipWithIndex.map { case ((spec, _), i) =>
        val f = termFreq(i, t)
        val len = size(col(s"__tok_$i")).cast("double")
        val norm = lit(params.k1) * (lit(1.0 - params.b) + lit(params.b) * len / lit(avgLen(i)))
        val tf = f / (f + norm)
        tf * lit(idf) * lit(spec.boost)
      }
      coalesce(perProp.reduce(_ + _), lit(0.0))
    }
    val matchedTerms: Column = queryTerms.zipWithIndex.map { case (t, _) =>
      propTok.indices.map(i => coalesce(array_contains(col(s"__tok_$i"), t), lit(false)))
        .reduce[Column](_ || _).cast("int")
    }.reduce(_ + _)

    val minMatch = params.searchOperator match {
      case SearchOperator.AndOp  => queryTerms.size
      case SearchOperator.Or(m)  => math.max(1, m)
    }
    val scored = scoredBase
      .withColumn(ScoreCol, perTermScore.reduce(_ + _))
      .withColumn("__matched", matchedTerms)
      .filter(col("__matched") >= minMatch)
    // explainScore: per-term score breakdown (reference: index.go:2266-2291)
    val explained =
      if (!explain) scored
      else queryTerms.zip(perTermScore).foldLeft(scored) { case (d, (t, sc)) =>
        d.withColumn(explainCol(t), sc)
      }
    explained.drop((propTok.indices.map(i => s"__tok_$i") :+ "__matched"): _*)
  }

  /** Top-k keyword search with deterministic id tie-break. */
  def search(c: Collection, params: Bm25, limit: Int, base: Option[DataFrame] = None): DataFrame =
    score(c, params, base)
      .orderBy(col(ScoreCol).desc, col(c.schema.idColumn).asc)
      .limit(limit)
}
