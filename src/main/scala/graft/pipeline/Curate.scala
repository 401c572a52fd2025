package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for training-data pipelines (engine extensions
 * beyond the weaviate surface): balance a corpus across strata while keeping
 * the best documents, and pack documents into fixed token budgets for
 * sequence building.
 */
object Curate {

  /**
   * Stratified quota sampling: the top `k` rows of every stratum by
   * `order` (descending, id tie-break) — "keep the 100k highest-quality
   * docs per language/source" in one pass. The window is PARTITIONED by the
   * strata, so each stratum ranks inside its own hash partition — no global
   * window, no single-task funnel; skewed strata are bounded by per-stratum
   * output k, and rows beyond rank k never leave their partition.
   * Returns the input columns + `sample_rank` (1-based within stratum).
   */
  def stratifiedTopK(df: DataFrame, strata: Seq[Column], order: Column,
                     idCol: Column, k: Int): DataFrame =
    df.withColumn("sample_rank",
        row_number().over(Window.partitionBy(strata: _*).orderBy(order.desc, idCol.asc)))
      .filter(col("sample_rank") <= k)

  /**
   * Token-budget packing: assign documents to training-sequence bins of
   * `budget` tokens by contiguous fill in id order WITHIN each shard —
   * bin = floor(exclusive-running-total / budget), so a document that
   * straddles a boundary belongs to the bin where its first token lands
   * (greedy contiguous packing; deterministic, no driver loop).
   *
   * The running total is a window partitioned by `shard` — packing is
   * per-shard by design (real pipelines pack within a data shard and ship
   * bins independently), because a single GLOBAL running total would funnel
   * the corpus through one window task. Shard by whatever already
   * partitions the data (source, date, hash-bucket of id).
   * Returns the input columns + `bin` (0-based within shard) and
   * `bin_offset` (the doc's starting token offset inside its shard).
   */
  def packByTokenBudget(df: DataFrame, shard: Seq[Column], idCol: Column,
                        tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shard: _*).orderBy(idCol.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("bin_offset", sum(tokensCol.cast("long")).over(w) - tokensCol.cast("long"))
      .withColumn("bin", floor(col("bin_offset") / budget))
  }

  /**
   * Deterministic mixture sampling — re-weight a corpus to target mixture
   * rates (the data-mixing step of The Pile / DoReMi-style training recipes:
   * each domain/source gets an acceptance rate, possibly > down-weighting
   * head domains and keeping tail domains whole). Each row draws a
   * reproducible uniform u ∈ [0,1) from its OWN id — the first 8 hex chars
   * of md5(id ‖ salt) over 2^32 — and survives iff u < rate. No RNG state,
   * no ordering dependence, stable under re-partitioning and re-runs, and
   * any engine with md5 reproduces the exact sample (the DuckDB oracle
   * does). One codegen'd scan, zero shuffle.
   *
   * `rate` is a per-row Column, so callers express mixtures as expressions
   * over source/language/quality (e.g. CASE WHEN source='cc' THEN 0.3 ...).
   * Rows with rate ≥ 1 always survive; rate ≤ 0 never.
   */
  def mixtureSample(df: DataFrame, idCol: Column, rate: Column,
                    salt: String = "graft"): DataFrame = {
    val u = conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0
    df.withColumn("sample_u", u).filter(col("sample_u") < rate)
  }

  /**
   * Temperature-scaled domain rates — the multilingual/domain re-balancing
   * rule of mT5/XLM-R (Conneau et al. 2020 §3.1: sample domain d with
   * probability ∝ p_d^τ, τ ∈ (0,1] flattens the head): computes each row's
   * ACCEPTANCE RATE for [[mixtureSample]] such that the sampled corpus hits
   * the p^τ-proportional mixture without upsampling any domain —
   * rate_d = (p_d^(τ−1)) / max_e(p_e^(τ−1)), so the rarest domain keeps
   * every row (rate 1) and head domains are thinned toward the target mix.
   *
   * Implemented as two tiny aggregations over the domain column (domain
   * cardinality ≪ rows) joined back BROADCAST — the per-row pass stays one
   * codegen'd scan. Adds `mix_rate`; feed it straight to mixtureSample.
   */
  /**
   * Cluster-balanced subset selection: cap the corpus at `perCluster` rows
   * per SEMANTIC cluster, preferring the most representative (highest cosine
   * to the cluster representative) — the topic-balancing step of
   * SemDeDup-style curation pipelines, where per-topic quotas stop one big
   * web topic from dominating the training mix. Clustering is the same
   * deterministic nearest-seed assignment [[Dedup.semantic]] uses (seeds =
   * the k smallest ids; trained KMeans centroids swap in at scale without
   * changing the quota semantics), so any engine reproduces the sample.
   *
   * Scale shape: one broadcast-assign scan + the per-cluster window of
   * [[stratifiedTopK]] (rows beyond rank `perCluster` never leave their
   * partition). Returns (id, cluster, cent_sim, sample_rank).
   */
  def clusterBalanced(df: DataFrame, idCol: Column, vecCol: Column,
                      k: Int, perCluster: Int): DataFrame = {
    val assigned = Dedup.seedAssign(df, idCol, vecCol, k)
    stratifiedTopK(assigned, Seq(col("__cluster")), col("__csim"), col("__id"), perCluster)
      .select(col("__id").as("id"), col("__cluster").as("cluster"),
        col("__csim").as("cent_sim"), col("sample_rank"))
  }

  def temperatureRates(df: DataFrame, domain: Column, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, "tau must be in (0, 1]")
    val counts = df.groupBy(domain.as("__dom")).agg(count(lit(1)).as("__n"))
    // p_d^(τ−1) up to the shared normalizer — counts substitute for p_d
    val scaled = counts.select(col("__dom"),
      pow(col("__n").cast("double"), tau - 1.0).as("__s"))
    // single-row normalizer broadcast onto the domain-cardinality frame —
    // the scalar-subquery pattern, reviewed in PlanGuardSpec's allowlist
    val mx = scaled.agg(max(col("__s")).as("__mx"))
    val rates = scaled.crossJoin(broadcast(mx))
      .select(col("__dom"), (col("__s") / col("__mx")).as("mix_rate"))
    df.join(broadcast(rates), domain === col("__dom")).drop("__dom")
  }
}
