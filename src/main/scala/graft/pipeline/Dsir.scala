package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling", NeurIPS):
 * select raw-corpus documents that look like a small TARGET corpus by
 * importance weights under two hashed-n-gram bag-of-words models.
 *
 *   1. featurize every doc as hashed unigram+bigram counts over B buckets;
 *   2. fit multinomial bucket distributions p̂ (target) and q̂ (raw) with
 *      add-α smoothing;
 *   3. per-doc log importance weight  log w_i = Σ_b c_{i,b} (log p̂_b − log q̂_b);
 *   4. sample without replacement via the Gumbel top-k trick — rank by
 *      log w_i + g_i with per-doc deterministic Gumbel noise.
 *
 * Scale shape (the paper selects from the full Pile): featurization is one
 * explode + codegen'd hash aggregation per corpus (partial map-side combine;
 * no token strings cross the shuffle — only (id, bucket) pairs); the fitted
 * model is a B-row table joined BROADCAST into the per-doc weight pass; the
 * final selection is a TakeOrderedAndProject (k rows per partition cross the
 * shuffle). Nothing driver-side, nothing pairwise.
 *
 * Determinism: bucketing and the Gumbel uniforms derive from md5 (first 8 hex
 * chars over 2^32, the same construction as [[Curate.mixtureSample]]), so any
 * engine with md5 — the DuckDB oracle included — reproduces weights, noise,
 * and the selected set exactly.
 */
object Dsir {

  /** Hash a token to a bucket id in [0, buckets): md5 → first 8 hex chars →
   * uint32 → mod. Codegen'd; vocabulary-free; engine-portable (vs xxhash64,
   * which the oracle cannot replay). */
  private def bucketOf(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  /** Word unigrams + space-joined bigrams of the lowercased alphanumeric
   * tokenization — the paper's hashed n-gram feature set (§3.1). */
  private def grams(text: Column): Column = {
    val toks = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bi = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    concat(toks, bi)
  }

  /** Per-doc hashed feature counts: (idCol, bucket, cnt). One explode +
   * hash aggregation; only (id, bucket) pairs shuffle. */
  def hashedNgramCounts(df: DataFrame, idCol: Column, text: Column,
                        buckets: Int): DataFrame =
    df.select(idCol.as("__id"), explode(grams(text)).as("__g"))
      .select(col("__id"), bucketOf(col("__g"), buckets).as("bucket"))
      .groupBy(col("__id"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Corpus-level bucket distribution → log-probability per bucket with
   * add-α smoothing: log((cnt_b + α) / (total + αB)). Returns the COMPLETE
   * B-row table (absent buckets carry cnt 0 — their smoothed mass is what
   * makes unseen-feature docs score sanely). */
  private def bucketLogProbs(counts: DataFrame, buckets: Int,
                             alpha: Double): DataFrame = {
    val spark = counts.sparkSession
    val perBucket = counts.groupBy(col("bucket")).agg(sum(col("cnt")).as("c"))
    val full = spark.range(buckets).select(col("id").as("bucket"))
      .join(perBucket, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("c"), lit(0L)).as("c"))
    // total is one scalar off a B-row frame; the single-row broadcast onto
    // the B-row side is the scalar-subquery pattern — O(B), reviewed in
    // PlanGuardSpec's allowlist (no driver round-trip for the model build)
    val tot = full.agg(sum(col("c")).as("tot"))
    full.crossJoin(broadcast(tot))
      .select(col("bucket"),
        log((col("c") + lit(alpha)) / (col("tot") + lit(alpha * buckets))).as("logp"))
  }

  /**
   * Fit the importance model: a B-row (bucket, log_ratio) table with
   * log_ratio = log p̂_target − log q̂_raw. Small by construction (B is
   * 10k in the paper) — always broadcastable.
   */
  def train(target: DataFrame, raw: DataFrame, idCol: Column, text: Column,
            buckets: Int, alpha: Double = 1.0): DataFrame = {
    val p = bucketLogProbs(hashedNgramCounts(target, idCol, text, buckets), buckets, alpha)
    val q = bucketLogProbs(hashedNgramCounts(raw, idCol, text, buckets), buckets, alpha)
    p.join(q.withColumnRenamed("logp", "logq"), Seq("bucket"))
      .select(col("bucket"), (col("logp") - col("logq")).as("log_ratio"))
  }

  /**
   * Per-doc log importance weight: input columns + `dsir_logw`
   * (= Σ_b c_{i,b} · log_ratio_b; 0 for feature-less docs). The model join
   * is an explicit broadcast; the weight sum is a hash aggregation keyed by
   * id; the join back to the input is on the id — co-partitioned with any
   * downstream per-doc work.
   */
  def logWeights(df: DataFrame, idCol: Column, text: Column,
                 model: DataFrame, buckets: Int): DataFrame = {
    val w = hashedNgramCounts(df, idCol, text, buckets)
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col("__id"))
      .agg(sum(col("cnt") * col("log_ratio")).as("dsir_logw"))
    df.join(w, df(idCol.toString) === w("__id"), "left")
      .drop("__id")
      .withColumn("dsir_logw", coalesce(col("dsir_logw"), lit(0.0)))
  }

  /**
   * Single-featurization weights for the common "target is a SLICE of the
   * raw corpus" case: ONE explode pass computes per-doc bucket counts
   * carrying the doc's target membership, and the target distribution, raw
   * distribution, and every doc's weight all derive from that pass (vs
   * train + logWeights = three passes over the corpus — at 100 TB the
   * featurization explode IS the job, so it must run once). Numerically
   * identical to `logWeights(df, …, train(df.filter(isTarget), df, …), …)`.
   */
  def logWeightsSelf(df: DataFrame, idCol: Column, text: Column,
                     isTarget: Column, buckets: Int,
                     alpha: Double = 1.0): DataFrame = {
    val counts = df
      .select(idCol.as("__id"), isTarget.as("__t"), explode(grams(text)).as("__g"))
      .select(col("__id"), col("__t"), bucketOf(col("__g"), buckets).as("bucket"))
      .groupBy(col("__id"), col("__t"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = bucketLogProbs(counts.filter(col("__t")), buckets, alpha)
    val q = bucketLogProbs(counts, buckets, alpha)
    val model = p.join(q.withColumnRenamed("logp", "logq"), Seq("bucket"))
      .select(col("bucket"), (col("logp") - col("logq")).as("log_ratio"))
    val w = counts.join(broadcast(model), Seq("bucket"))
      .groupBy(col("__id"))
      .agg(sum(col("cnt") * col("log_ratio")).as("dsir_logw"))
    df.join(w, df(idCol.toString) === w("__id"), "left")
      .drop("__id")
      .withColumn("dsir_logw", coalesce(col("dsir_logw"), lit(0.0)))
  }

  /**
   * Gumbel top-k resampling (sampling k docs without replacement ∝ softmax
   * of the log weights): rank by dsir_logw + g_i where
   * g_i = −ln(−ln(u_i)) and u_i is the doc's own md5-derived uniform —
   * reproducible, order-independent, re-run-stable. Adds `dsir_score`;
   * returns the k survivors. TakeOrderedAndProject-shaped.
   */
  def resample(df: DataFrame, idCol: Column, logwCol: Column, k: Int,
               salt: String = "dsir"): DataFrame = {
    // (x+1)/2^32+1 ∈ (0,1) keeps both logs finite at the u=0 corner
    val u = (conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long").cast("double") + 1.0) / 4294967297.0
    df.withColumn("dsir_score", logwCol - log(-log(u)))
      .orderBy(col("dsir_score").desc, idCol.asc)
      .limit(k)
  }
}
