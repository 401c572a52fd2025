package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Collection
import graft.model.{Bm25, PropType, SearchOperator, Tokenization}
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
 */
final case class PostingsIndex(
    postings: DataFrame,   // (term, __id, tf, __bucket)
    docLens: DataFrame,    // (__id, dl)
    termDf: DataFrame,     // (term, df)
    maxImpact: DataFrame,  // (term, __bucket, max_sat) — block-max metadata
    nDocs: Long,
    avgLen: Double,
    idCol: String,
    k1: Double,
    b: Double,
    buckets: Int)

object Postings {

  def build(c: Collection, prop: String, k1: Double = 1.2, b: Double = 0.75,
            buckets: Int = 64): PostingsIndex = {
    val mode = c.schema.property(prop).map(_.tokenization).getOrElse(Tokenization.Word)
    val id = c.schema.idColumn
    val toks = c.df.select(col(id).as("__id"), Tokenize(mode)(col(prop)).as("__toks"))
    val docLens = toks.select(col("__id"), size(col("__toks")).cast("double").as("dl")).cache()
    val stats = docLens.agg(count(lit(1)).as("n"), avg(col("dl")).as("avg")).head()
    val avgLen = stats.getDouble(1)
    val postings = toks
      .select(col("__id"), explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("__id")).agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("__bucket", pmod(xxhash64(col("__id")), lit(buckets)).cast("int"))
      .cache()
    val termDf = postings.groupBy(col("term"))
      .agg(countDistinct(col("__id")).cast("double").as("df")).cache()
    // block-max metadata (the Spark analogue of the reference's per-block
    // max-impact stats, inverted/terms/terms_block.go): per (term, bucket),
    // the max *saturated tf* — idf multiplies in at query time
    val maxImpact = postings.join(docLens, "__id")
      .withColumn("__sat", col("tf") / (col("tf") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgLen))))
      .groupBy(col("term"), col("__bucket"))
      .agg(max(col("__sat")).as("max_sat"))
      .cache()
    PostingsIndex(postings, docLens, termDf, maxImpact,
      stats.getLong(0), avgLen, id, k1, b, buckets)
  }

  /** BM25 scoring over the postings table — identical math to Bm25Search
   * (idf = ln(1+(N−n+0.5)/(n+0.5)); tf saturation with k1/b). */
  def search(idx: PostingsIndex, query: String, limit: Int,
             searchOperator: SearchOperator = SearchOperator.Or(1),
             k1: Double = 1.2, b: Double = 0.75,
             mode: Tokenization = Tokenization.Word): DataFrame = {
    val terms = Tokenize.queryTokens(mode, query).distinct
    require(terms.nonEmpty, "bm25: empty query after tokenization")
    // driver-side df lookup: the term-df table is tiny relative to postings
    val dfs: Map[String, Double] = idx.termDf
      .filter(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val idf: Map[String, Double] = terms.map { t =>
      val n = dfs.getOrElse(t, 0.0)
      t -> math.log(1.0 + (idx.nDocs - n + 0.5) / (n + 0.5))
    }.toMap
    val idfCol = terms.foldLeft(lit(0.0)) { (acc, t) =>
      when(col("term") === t, lit(idf(t))).otherwise(acc)
    }
    val minMatch = searchOperator match {
      case SearchOperator.AndOp => terms.size
      case SearchOperator.Or(m) => math.max(1, m)
    }
    idx.postings
      .filter(col("term").isin(terms: _*)) // pushdown → reads only these terms' partitions
      .join(idx.docLens, "__id")
      .withColumn("__contrib",
        idfCol * (col("tf") / (col("tf") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(idx.avgLen)))))
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
   * best-bounded bucket — a lower bound of the global kth score. A doc in
   * any bucket with upper bound Σ_t idf_t·maxSat(t,bucket) < θ scores
   * strictly below θ ≤ global-kth, so pruning that bucket cannot evict a
   * true top-k member (strict inequality also survives ties). At 100 TB the
   * bucket is a physical partition of the postings layout, so pruning skips
   * whole partitions of every term's posting list.
   */
  def searchPruned(idx: PostingsIndex, query: String, limit: Int,
                   mode: Tokenization = Tokenization.Word): DataFrame = {
    val terms = Tokenize.queryTokens(mode, query).distinct
    require(terms.nonEmpty, "bm25: empty query after tokenization")
    val dfs: Map[String, Double] = idx.termDf
      .filter(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val idf: Map[String, Double] = terms.map { t =>
      val n = dfs.getOrElse(t, 0.0)
      t -> math.log(1.0 + (idx.nDocs - n + 0.5) / (n + 0.5))
    }.toMap

    // driver-side bucket bounds from the (tiny) block-max table
    val bounds: Map[Int, Double] = idx.maxImpact
      .filter(col("term").isin(terms: _*))
      .collect()
      .groupBy(_.getInt(1))
      .map { case (bkt, rows) =>
        bkt -> rows.map(r => idf(r.getString(0)) * r.getDouble(2)).sum
      }
    if (bounds.isEmpty) return search(idx, query, limit, mode = mode).limit(0)

    def scoreBuckets(bkts: Seq[Int]): DataFrame = {
      val idfCol = terms.foldLeft(lit(0.0)) { (acc, t) =>
        when(col("term") === t, lit(idf(t))).otherwise(acc)
      }
      idx.postings
        .filter(col("term").isin(terms: _*) && col("__bucket").isin(bkts: _*))
        .join(idx.docLens, "__id")
        .withColumn("__contrib",
          idfCol * (col("tf") / (col("tf") +
            lit(idx.k1) * (lit(1.0 - idx.b) + lit(idx.b) * col("dl") / lit(idx.avgLen)))))
        .groupBy(col("__id"))
        .agg(sum(col("__contrib")).as(Bm25Search.ScoreCol))
    }

    // phase 1: exact scores in the best-bounded bucket → θ (kth best, or -inf)
    val bestBucket = bounds.maxBy(_._2)._1
    val phase1 = scoreBuckets(Seq(bestBucket))
      .orderBy(col(Bm25Search.ScoreCol).desc).limit(limit)
      .collect().map(_.getDouble(1))
    val theta = if (phase1.length < limit) Double.NegativeInfinity else phase1.min

    // phase 2: scan only buckets whose bound can reach θ
    val survivors = bounds.filter { case (_, bound) => bound >= theta }.keys.toSeq
    scoreBuckets(survivors)
      .withColumnRenamed("__id", idx.idCol)
      .orderBy(col(Bm25Search.ScoreCol).desc, col(idx.idCol).asc)
      .limit(limit)
  }
}
