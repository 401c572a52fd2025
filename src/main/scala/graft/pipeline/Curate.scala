package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions}
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
                    salt: String = "graft"): DataFrame =
    df.withColumn("sample_u", uniformDraw(idCol, salt))
      .filter(col("sample_u") < rate)

  /** The shared reproducible uniform: u ∈ [0,1) from the first 8 hex chars
   * of md5(id ‖ salt) over 2^32. mixtureSample and hashSplit MUST draw from
   * this one definition — the DuckDB oracles replay it verbatim, and a
   * tweak applied to one call site but not the other would silently break
   * the cross-operator determinism contract. */
  private def uniformDraw(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

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

  /**
   * Token-window chunking with overlap — the training-example maker: split
   * each document into windows of `size` tokens advancing by
   * `size - overlap`, so consecutive chunks share `overlap` tokens of
   * context. The tail rule: a chunk is emitted iff it contributes at least
   * one NEW token (its start `s` satisfies `s == 0 || s < ntok - overlap`),
   * so a final window that would be entirely contained in its predecessor's
   * overlap never appears. Token-less documents drop (no windows — the same
   * rule as the dedup shingle paths).
   *
   * Scale shape: one narrow projection + `posexplode` of a per-row
   * `sequence` — linear in output tokens, no shuffle at all; chunk rows
   * inherit the input partitioning so a downstream `groupBy(id)` or pack
   * step shuffles once on the natural key.
   *
   * Returns (id, chunk_index, start_token, n_tokens, chunk_text).
   */
  def chunk(df: DataFrame, idCol: Column, textCol: Column,
            size: Int, overlap: Int): DataFrame = {
    require(size > 0, "chunk: size must be positive")
    require(overlap >= 0 && overlap < size, "chunk: need 0 <= overlap < size")
    val step = size - overlap
    val base = df.select(idCol.as("id"), graft.text.Tokenize.word(textCol).as("__toks"))
      .withColumn("__ntok", functions.size(col("__toks")))
      .filter(col("__ntok") > 0)
    val starts = filter(
      sequence(lit(0), col("__ntok") - 1, lit(step)),
      s => s === 0 || s < col("__ntok") - overlap)
    base.select(col("id"), col("__toks"), col("__ntok"),
        posexplode(starts).as(Seq("chunk_index", "start_token")))
      .withColumn("__chunk", slice(col("__toks"), col("start_token") + 1, lit(size)))
      .select(col("id"), col("chunk_index"), col("start_token").cast("long"),
        functions.size(col("__chunk")).cast("long").as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /**
   * UniMax language sampling (Chung et al. 2023, "UniMax: Fairer and More
   * Effective Language Sampling…"): allocate a total token/document budget
   * across languages with a hard per-language epoch cap, greedily from the
   * SMALLEST language up — each language receives
   * `min(count · maxEpochs, remaining / languagesLeft)`, so tail languages
   * get as close to uniform shares as their size allows (never repeating
   * more than `maxEpochs` times) and the head splits whatever remains
   * evenly. The result is the standard fairer alternative to
   * [[temperatureRates]] (which can over-repeat tiny languages).
   *
   * The recurrence is sequential in the number of LANGUAGES — a class-sized
   * model like [[Classify.zeroShot]]'s label set, so the per-language counts
   * collect driver-side (guarded by `maxLangs`) and the quotas return as a
   * literal local frame, broadcast-joinable onto the corpus.
   *
   * Returns one row per language: (lang, n_docs, quota, epochs), quota in
   * document units (fractional — callers sample by rate epochs = quota/n).
   */
  def unimax(df: DataFrame, langCol: Column, budget: Double,
             maxEpochs: Double, maxLangs: Int = 4096): DataFrame = {
    require(budget > 0, "unimax: budget must be positive")
    require(maxEpochs > 0, "unimax: maxEpochs must be positive")
    val spark = df.sparkSession
    val counts = df.groupBy(langCol.cast("string").as("__lang"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, n) => (n, l) } // smallest language first; name ties
    require(counts.length <= maxLangs,
      s"unimax: ${counts.length} languages exceed maxLangs=$maxLangs — " +
      "languages are a class-sized stratum, not a per-row key")
    var remaining = budget
    val rows = counts.zipWithIndex.map { case ((lang, n), i) =>
      val left = counts.length - i
      val quota = math.min(n * maxEpochs, remaining / left)
      remaining -= quota
      (lang, n, quota, quota / n)
    }
    import spark.implicits._
    rows.toSeq.toDF("lang", "n_docs", "quota", "epochs")
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

  /**
   * Deterministic train/val/test assignment: each row hashes to a uniform
   * u ∈ [0,1) — the same md5-prefix construction [[mixtureSample]] uses —
   * and lands in the first split whose cumulative weight exceeds u. No RNG
   * state, stable under re-partitioning, re-runs, and INCREMENTAL arrival:
   * a row's split never changes when more data lands, which is the property
   * that keeps eval sets leak-free across pipeline re-runs (a
   * `randomSplit`-style sampler re-deals every row on every run).
   *
   * `splits` maps name → weight (weights need not sum to 1; they are
   * normalized). Deterministic tie-policy: boundaries belong to the LATER
   * split (u < cum is strict). One codegen'd scan, zero shuffle; adds
   * `split` and the diagnostic `split_u`.
   */
  def hashSplit(df: DataFrame, idCol: Column, splits: Seq[(String, Double)],
                salt: String = "graft-split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be > 0")
    val total = splits.map(_._2).sum
    val cums = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val withU = df.withColumn("split_u", uniformDraw(idCol, salt))
    // fold from the LAST split backward so the first matching boundary wins
    val assign = splits.zip(cums).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), cum)) => when(col("split_u") < cum, name).otherwise(acc)
    }
    // a null id draws a null u; every boundary predicate is then null-false
    // and the fold's terminal otherwise would silently dump the row in the
    // LAST split (the eval set!) — keep the assignment honestly null instead
    withU.withColumn("split",
      when(col("split_u").isNotNull, assign).otherwise(lit(null).cast("string")))
  }
}
