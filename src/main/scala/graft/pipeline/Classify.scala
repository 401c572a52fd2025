package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.IvfIndex
import graft.model.{Metric, PropType, Where}
import graft.operators.KnnJoin
import graft.sources.CollectionStore

/**
 * Outcome of a classification run (reference: models.Classification status
 * fields set by classifier_run.go:144-148 — Completed/CountSucceeded/
 * CountFailed/Count — and succeedRun/failRunWithError:152-171).
 */
final case class ClassificationRun(
    id: String, status: String, error: Option[String],
    count: Long, countSucceeded: Long, countFailed: Long)

/**
 * kNN classification as a batch job (reference: usecases/classification/
 * classifier.go:229-300, adapters/repos/db/classification.go:33-120): assign
 * each unlabeled object the majority label among its k nearest labeled
 * neighbours; ties break to the smallest label (the reference's winner pick is
 * map-iteration-unordered — we pin a total order for reproducibility).
 */
object Classify {

  /** @return (probe_id, predicted_label, votes) one row per probe.
   * With `index` (an IvfIndex over the labeled set's vector column) the
   * neighbour search is the IVF-bucketed join — the scale path; without it,
   * brute force (correct for small probe sets only). */
  def knn(
      labeled: DataFrame, labeledId: Column, labeledVec: Column, labelCol: Column,
      probes: DataFrame, probeId: Column, probeVec: Column,
      k: Int, metric: Metric = Metric.L2Squared,
      index: Option[IvfIndex] = None, nprobe: Option[Int] = None): DataFrame = {
    val neighbours = index match {
      case Some(ix) =>
        // the index must be built over THIS labeled frame's id/vector columns
        // — an index over a different frame would silently drop neighbours at
        // the label join below (fewer than k votes, no error)
        require(ix.idCol == labeledId.toString && ix.vecCol == labeledVec.toString,
          s"index columns (${ix.idCol}, ${ix.vecCol}) do not match the labeled " +
          s"frame's ($labeledId, $labeledVec) — build the IvfIndex over `labeled`")
        KnnJoin.bucketed(ix, probes, probeId, probeVec, k, metric,
          nprobe.getOrElse(ix.defaultNprobe))
      case None => KnnJoin(labeled, labeledId, labeledVec,
        probes, probeId, probeVec, k, metric)
    }
    val withLabels = neighbours.join(
      labeled.select(labeledId.as("data_id"), labelCol.as("label")), Seq("data_id"))
    val votes = withLabels.groupBy(col("probe_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("votes").desc, col("label").asc)
    votes.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("probe_id"), col("label").as("predicted_label"), col("votes"))
  }

  /** Column holding the object-level classification meta after a [[knnJob]]
   * write-back (reference: `_additional { classification }`,
   * entities/additional/classification.go — {id, scope, classifiedFields,
   * completed}; attached by classifier_run.go:173-187
   * extendItemWithObjectMeta). */
  val MetaCol = "_classification"

  /** Per-ref meta column for a classified property (reference: the winning
   * SingleRef's Classification payload — models.ReferenceMetaClassification
   * built in ref_meta.go:30-55: neighbour counts plus normalized
   * winning/losing distances). */
  def refMetaCol(prop: String): String = s"${prop}__refMeta"

  /**
   * The full classification RUN over a collection store — the engine analogue
   * of `POST /v1/classifications` with type=knn (reference:
   * usecases/classification/classifier_run.go + adapters/repos/db/
   * classification.go):
   *
   *  - to-be-classified = rows whose `classifyProp` ref-count is 0, ANDed
   *    with `sourceWhere` (GetUnclassified:33-59 merges the user source
   *    filter with count(prop) == 0); zero such rows fails the run with the
   *    reference's error text (classifier_run.go:49-52);
   *  - training set = rows whose ref-count is > 0, ANDed with
   *    `trainingWhere` (AggregateNeighbors:90-116 merges count(prop) > 0);
   *  - per item: the k nearest training rows by NormalizedDistance =
   *    (1 − cos)/2 (usecases/vectorizer/distance.go:21); votes group by the
   *    ref target and the winner is the most-voted target
   *    (aggregateBeacons:180-200 — reference map iteration is unordered on
   *    ties, pinned here to the smallest target id), written with counts +
   *    winning/losing distance meta (ref_meta.go);
   *  - a training neighbour with ≠ 1 label fails THAT item
   *    (extractBeacons:163 "a knn training data object needs to have exactly
   *    one label" — the per-item error becomes CountFailed and the item is
   *    not written, classifier_run_worker.go);
   *  - write-back: succeeded items get `classifyProp` = the winning target,
   *    the per-ref meta struct in [[refMetaCol]], and the object-level
   *    [[MetaCol]] = {id, scope, classifiedFields, completed}. Items with no
   *    neighbours (empty training set) still succeed, with empty
   *    classifiedFields (aggregateBeacons over zero results returns nil,
   *    the item stores meta-only).
   *
   * Scale shape: the to-be-classified/training split is two pushed-down scan
   * predicates over one cached read; the kNN is [[KnnJoin]] (brute broadcast
   * for page-sized probe sets; IVF-bucketed with the salted-shuffle switch
   * via `index` — the 100 TB path); vote/stat aggregation is two hash-aggs
   * plus one probe-partitioned bounded window; the write-back is the store's
   * single id-keyed upsert join.
   *
   * @return the run report (reference: models.Classification meta fields);
   *         the classified objects live in the store's new version.
   */
  def knnJob(
      store: CollectionStore, vecCol: String, classifyProp: String, k: Int,
      runId: String, completedAtMicros: Long,
      sourceWhere: Option[Where] = None,
      trainingWhere: Option[Where] = None,
      index: Option[IvfIndex] = None, nprobe: Option[Int] = None): ClassificationRun = {
    require(k >= 1, "knnJob: k must be >= 1")
    require(store.schema.property(classifyProp).exists(_.dataType == PropType.Ref),
      s"knnJob: $classifyProp is not a cref property (validation.go:121 — " +
      "classifyProperties must be reference props)")
    val idCol = store.schema.idColumn
    index.foreach { ix =>
      require(ix.idCol == idCol && ix.vecCol == vecCol,
        s"knnJob: index columns (${ix.idCol}, ${ix.vecCol}) do not match " +
        s"($idCol, $vecCol) — build the IvfIndex over this store's TRAINING rows")
      // the index ranks top-k BEFORE the training join; a training filter the
      // index does not know about would silently discard ranked neighbours
      // (classifying from < k eligible rows) instead of ranking the next
      // nearest eligible ones
      require(trainingWhere.isEmpty,
        "knnJob: trainingWhere cannot combine with an index — rebuild the " +
        "IvfIndex over exactly the filtered training rows instead")
    }
    // one read, four consumers (source split, training split, write-back join)
    val current = store.read()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val isArray = current.schema(classifyProp).dataType
        .isInstanceOf[org.apache.spark.sql.types.ArrayType]
      // isNull-branched, not coalesce(size(...), 0): under
      // spark.sql.legacy.sizeOfNull=true size(null) is -1 (not null), which
      // would put null-ref rows in NEITHER split
      val refCnt =
        if (isArray) when(col(classifyProp).isNull, lit(0)).otherwise(size(col(classifyProp)))
        else when(col(classifyProp).isNotNull, lit(1)).otherwise(lit(0))
      def compiled(w: Option[Where], df: DataFrame): DataFrame = w match {
        case Some(where) =>
          new graft.engine.FilterCompiler(n => throw new IllegalArgumentException(
            s"knnJob filters cannot traverse refs (no target $n registered)"))(
            df, store.schema, where)
        case None => df
      }
      val unclassified = compiled(sourceWhere, current).filter(refCnt === 0)
      val training = compiled(trainingWhere, current).filter(refCnt > 0)
      val total = unclassified.count()
      if (total == 0)
        return ClassificationRun(runId, "failed",
          Some("no classes to be classified - did you run a previous classification already?"),
          0L, 0L, 0L)

      // Metric.Cosine (1 − cos) is a positive monotone double of
      // NormalizedDistance, so the top-k is identical and the reported
      // distances are dist / 2
      val neighbours = index match {
        case Some(ix) => KnnJoin.bucketed(ix, unclassified, col(idCol), col(vecCol),
          k, Metric.Cosine, nprobe.getOrElse(ix.defaultNprobe), excludeSelf = false)
        case None => KnnJoin(training, col(idCol), col(vecCol),
          unclassified, col(idCol), col(vecCol), k, Metric.Cosine, excludeSelf = false)
      }
      // LEFT join so an index that contains non-training rows fails LOUDLY
      // below instead of silently thinning each probe's neighbourhood
      val labelled = neighbours.join(
        training.select(col(idCol).as("data_id"), lit(true).as("__train"),
          (if (isArray) col(classifyProp) else array(col(classifyProp))).as("__refs")),
        Seq("data_id"), "left")
        .withColumn("__bad", size(col("__refs")) =!= 1)
        .withColumn("__target", element_at(col("__refs"), 1))
        .withColumn("__nd", col("dist") / 2)
        // one evaluation for the three stats consumers below (the kNN join
        // is the dominant cost; different agg keys prevent exchange reuse)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perTarget = labelled.groupBy(col("probe_id"), col("__target")).agg(
        count(lit(1)).as("__votes"), min(col("__nd")).as("__minD"),
        sum(col("__nd")).as("__sumD"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("__votes").desc, col("__target").asc)
      val winners = perTarget.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("probe_id"), col("__target").as("__win"),
          col("__votes").as("winningCount"),
          col("__minD").as("closestWinningDistance"),
          (col("__sumD") / col("__votes")).as("meanWinningDistance"))
      val losing = perTarget.join(
          winners.select(col("probe_id"), col("__win")), Seq("probe_id"))
        .filter(col("__target") =!= col("__win"))
        .groupBy(col("probe_id")).agg(
          sum(col("__votes")).as("losingCount"),
          min(col("__minD")).as("closestLosingDistance"),
          (sum(col("__sumD")) / sum(col("__votes"))).as("meanLosingDistance"))
      val perProbe = labelled.groupBy(col("probe_id")).agg(
        max(col("__bad")).as("__itemBad"),
        count(lit(1)).as("overallCount"),
        min(col("__nd")).as("closestOverallDistance"))
      val stats = winners.join(perProbe, Seq("probe_id"))
        .join(losing, Seq("probe_id"), "left")
        .withColumn("losingCount", coalesce(col("losingCount"), lit(0L)))
        // three consumers (stray-index check, failed tally, write-back join)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val strays = labelled.filter(!coalesce(col("__train"), lit(false))).count()
        require(strays == 0L,
          s"knnJob: $strays ranked neighbours are not training rows — the " +
          "index contains unclassified or stale vectors; rebuild it over " +
          "exactly the ref-count>0 rows")
        val failed = stats.filter(col("__itemBad")).count()
        val metaStruct = struct(
          col("overallCount"), col("winningCount"), col("losingCount"),
          col("closestOverallDistance"), col("closestWinningDistance"),
          col("meanWinningDistance"), col("closestLosingDistance"),
          col("meanLosingDistance"))
        val updates = unclassified
          .join(stats.select(col("probe_id").as(idCol), col("__itemBad"),
            col("__win"), metaStruct.as("__meta")), Seq(idCol), "left")
          // failed items are NOT written (their update row drops here);
          // no-stats rows (empty training set) are meta-only successes
          .filter(!coalesce(col("__itemBad"), lit(false)))
          .withColumn(classifyProp,
            if (isArray) when(col("__win").isNotNull, array(col("__win")))
              // an unclassified field the run did not classify keeps its
              // stored value (empty array stays [], not null)
              .otherwise(col(classifyProp))
            else coalesce(col("__win"), col(classifyProp)))
          .withColumn(refMetaCol(classifyProp), col("__meta"))
          .withColumn(MetaCol, struct(
            lit(runId).as("id"), array(lit(classifyProp)).as("scope"),
            when(col("__win").isNotNull, array(lit(classifyProp)))
              .otherwise(array().cast("array<string>")).as("classifiedFields"),
            timestamp_micros(lit(completedAtMicros)).as("completed")))
          .drop("__itemBad", "__win", "__meta")
        store.upsert(updates)
        ClassificationRun(runId, "completed", None, total, total - failed, failed)
      } finally { stats.unpersist(); labelled.unpersist() }
    } finally current.unpersist()
  }

  /**
   * Zero-shot classification (reference: usecases/classification/
   * classifier_run.go zeroshot path — each unlabeled object gets the label of
   * its single nearest neighbour among the label-source objects, whose vectors
   * come from vectorizing the label names; no training data).
   *
   * Scale shape: the label set is bounded by the number of classes, so the
   * candidates are collected driver-side and the argmin is ONE codegen'd
   * `least()` over per-label distance structs — a pure map-side projection
   * over the 100 TB data frame, no join, no shuffle, no window. Ties break
   * (distance, label) ascending for reproducibility.
   *
   * @return (probe_id, predicted_label, dist) one row per data row.
   */
  def zeroShot(
      data: DataFrame, dataId: Column, dataVec: Column,
      labels: DataFrame, labelCol: Column, labelVec: Column,
      metric: Metric = Metric.Cosine, maxLabels: Int = 1024): DataFrame = {
    import org.apache.spark.sql.graft.VectorFunctions
    val labelRows = labels.select(labelCol.cast("string"), labelVec).collect()
    require(labelRows.nonEmpty, "zeroShot: empty label set")
    require(labelRows.length <= maxLabels,
      s"zeroShot: ${labelRows.length} labels exceed maxLabels=$maxLabels — " +
      "zero-shot label sets are class-name-sized; use knn for example-labeled data")
    val candidates = labelRows.toSeq.map { r =>
      val vec = typedLit(r.getSeq[Float](1).toArray)
      struct(
        VectorFunctions.distance(metric)(dataVec, vec).as("dist"),
        lit(r.getString(0)).as("label"))
    }
    val best = if (candidates.size == 1) candidates.head else least(candidates: _*)
    data.select(
      dataId.as("probe_id"),
      best.getField("label").as("predicted_label"),
      best.getField("dist").as("dist"))
  }

  /**
   * Multinomial Naive Bayes — TRAINED text classification, the standard
   * quality/domain/language classifier of large-corpus curation stacks
   * (beyond the reference's kNN/zeroShot/contextual types, which never fit a
   * model; this one learns token likelihoods from a labeled frame and scores
   * any probe frame). Model, with Laplace smoothing `alpha`:
   *
   *   prior(c)      = ln(docs_c / N)                   over trained docs
   *   lik(w | c)    = ln((count(w,c) + alpha) / (tokens_c + alpha * |V|))
   *   score(d, c)   = prior(c) + Σ_{token occurrences w ∈ d ∩ V} lik(w | c)
   *
   * and the prediction is argmax_c score with ties to the SMALLEST label.
   * Training rows with no `word` tokens are excluded from the model (they
   * carry no evidence — same rule as [[contextual]]'s no-words drop); probe
   * tokens outside the training vocabulary V are dropped (standard
   * multinomial NB; a probe with NO in-vocabulary tokens still classifies,
   * on priors alone). All math is double, so any engine replays it exactly.
   *
   * Scale shape: the label set is class-sized — its stats (doc/token counts)
   * collect driver-side like [[zeroShot]]'s label vectors, and everything
   * per-label becomes plan literals. The model table is one hash-agg over
   * exploded training tokens pivoted to a dense per-label likelihood array
   * (|V| rows, L-wide); scoring is explode → ONE equi-join on the token →
   * one hash-agg per probe (per-label sums as L literal aggregate columns,
   * map-side combined) → argmax as a codegen'd `least`. No window, no
   * driver loop, no pairwise work.
   *
   * @return (probe_id, predicted_label, log_score, matched_tokens) one row
   *         per probe row.
   */
  def naiveBayes(
      labeled: DataFrame, labeledText: Column, labelCol: Column,
      probes: DataFrame, probeId: Column, probeText: Column,
      alpha: Double = 1.0, maxLabels: Int = 1024): DataFrame = {
    require(alpha > 0, "naiveBayes: alpha must be positive")
    val train = labeled
      .select(labelCol.cast("string").as("__lbl"),
        graft.text.Tokenize.word(labeledText).as("__toks"))
      .filter(size(col("__toks")) > 0)
      // three consumers (label stats, vocabulary count, likelihood build)
      // would each re-tokenize the labeled corpus — one materialization
      // (the minhashDuplicates shingle-table precedent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // label stats are class-sized model constants (the zeroShot precedent)
    val stats = train.groupBy(col("__lbl"))
      .agg(count(lit(1)).as("__docs"), sum(size(col("__toks"))).as("__tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(stats.nonEmpty, "naiveBayes: no trainable labeled rows")
    require(stats.length <= maxLabels,
      s"naiveBayes: ${stats.length} labels exceed maxLabels=$maxLabels — " +
      "labels are class names; cardinality-sized keys are not a label set")
    val nDocs = stats.map(_._2).sum.toDouble
    val priors = stats.map { case (_, d, _) => math.log(d / nDocs) }

    val wc = train.select(col("__lbl"), explode(col("__toks")).as("__w"))
      .groupBy(col("__lbl"), col("__w")).agg(count(lit(1)).as("__cnt"))
    val vocabSize = wc.select(col("__w")).distinct().count().toDouble

    // dense per-label likelihood array: |V| rows, L literal-derived entries
    val lik = wc.groupBy(col("__w"))
      .agg(map_from_entries(collect_list(struct(col("__lbl"), col("__cnt")))).as("__m"))
      .select(col("__w"), array(stats.map { case (l, _, tok) =>
        log((coalesce(element_at(col("__m"), lit(l)), lit(0L)).cast("double")
          + lit(alpha)) / lit(tok + alpha * vocabSize))
      }: _*).as("__lik"))

    val base = probes.select(probeId.as("probe_id"), probeText.as("__txt"))
    val sums = base
      .select(col("probe_id"),
        explode(graft.text.Tokenize.word(col("__txt"))).as("__w"))
      .join(lik, Seq("__w"))
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("__m"),
        stats.indices.map(i =>
          sum(element_at(col("__lik"), i + 1)).as(s"__s$i")): _*)
    // least over (−score, label) = argmax score with ties to the smaller label
    val cands = stats.zipWithIndex.map { case ((l, _, _), i) =>
      struct((-(lit(priors(i)) + coalesce(col(s"__s$i"), lit(0.0)))).as("nscore"),
        lit(l).as("label"))
    }
    val best = if (cands.size == 1) cands.head else least(cands: _*)
    base.join(sums, Seq("probe_id"), "left")
      .select(col("probe_id"),
        best.getField("label").as("predicted_label"),
        (-best.getField("nscore")).as("log_score"),
        coalesce(col("__m"), lit(0L)).as("matched_tokens"))
  }

  /**
   * Contextual (training-data-free) classification — the reference's
   * `text2vec-contextionary-contextual` type (modules/text2vec-contextionary/
   * classification/classifier_run_contextual.go + tf_idf.go), as one
   * distributed plan instead of a per-item driver loop. Model, per source row:
   *
   *  1. words = lowercased letter/digit runs of the basedOn text
   *     (splitter.go FieldsFunc ≡ Tokenize.word);
   *  2. per word: informationGain = mean(cosine dist to every target) − min
   *     (scoreWord:335-363 — words that discriminate BETWEEN targets score
   *     high); per-doc ranking by IG desc (rank:293-307; Go's sort.Slice is
   *     unstable on ties — pinned here with the word as tie-break);
   *  3. per word: tf-idf within the source corpus (tf_idf.go — tf =
   *     occurrences/docLength, idf = log10(N/docsContaining)), per-doc
   *     ranking by tf-idf desc (same tie-break pin);
   *  4. corpus = the doc's word OCCURRENCES inside BOTH the IG top
   *     `igCutoffPercentile`% and the tf-idf top `tfidfCutoffPercentile`% of
   *     the doc's distinct words (buildBoostedCorpus:203-228, cutoffs are
   *     integer-truncated); fewer than `minimumUsableWords` occurrences →
   *     fall back to the top-`minimumUsableWords` IG-ranked words once each;
   *  5. IG-top words boost their weight: rank index i (0-based) within the
   *     IG cutoff gets min(igMaximumBoost, 1 − ln(i/cutoff)), i = 0 → the
   *     max boost (boostByInformationGain:231-247, ln(0) = −∞ capped);
   *  6. the boosted corpus vectorizes as the weighted sum of word vectors
   *     (the VectorOnlyForCorpi module call — here the same bag-of-words
   *     stand-in family as the text vectorizer; cosine is scale-invariant so
   *     the sum needs no normalization), and the prediction is the cosine
   *     argmin over the target objects with its winningDistance
   *     (findClosestTarget:184-201; ties pinned to the smaller target).
   *
   * All math is double (the reference mixes float32 ops — documented
   * divergence at ~1e-7, which the t2 oracle replays in double too).
   *
   * Scale shape: tokenize explode → per-word hash aggs (df/idf), the word
   * vectorization UDF only over DISTINCT words (the module boundary), per-doc
   * rankings as doc-partitioned windows, the corpus vector as dim-level hash
   * aggs, and the target argmin as one codegen'd `least` over per-target
   * structs (targets are class objects — bounded, plan literals). No join by
   * anything but equi-keys, no driver loop.
   *
   * @return (id, target, winning_distance) — one row per source row with at
   *         least one word.
   */
  def contextual(
      source: DataFrame, idCol: Column, textCol: Column,
      targets: Seq[(String, Array[Float])],
      wordVec: String => Array[Float],
      minimumUsableWords: Int = 3,
      igCutoffPercentile: Int = 50,
      igMaximumBoost: Double = 3.0,
      tfidfCutoffPercentile: Int = 80): DataFrame = {
    import org.apache.spark.sql.graft.VectorFunctions
    require(targets.nonEmpty && targets.size <= 1024,
      "contextual: targets are class objects — a bounded, literal-sized set")
    require(minimumUsableWords >= 1 && igCutoffPercentile >= 0 &&
      tfidfCutoffPercentile >= 0 && igMaximumBoost > 0, "invalid settings")

    val docs = source
      .select(idCol.as("__id"), graft.text.Tokenize.word(textCol).as("__toks"))
      .filter(size(col("__toks")) > 0)
      // multiple consumers (corpus count, occ's branches) — materialize the
      // tokenization once (the naiveBayes/minhashDuplicates precedent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // tf-idf corpus size — a model constant, like a quantizer's training pass
    val n = docs.count().toDouble

    val occ = docs.withColumn("__dl", size(col("__toks")))
      .select(col("__id"), col("__dl"), explode(col("__toks")).as("__w"))
      .groupBy(col("__id"), col("__dl"), col("__w"))
      .agg(count(lit(1)).as("__cnt"))
      // occ itself feeds ranked, dfIdf, and wordStats — three plan branches
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfIdf = occ.groupBy(col("__w"))
      .agg(countDistinct(col("__id")).as("__docs"))
      .withColumn("__idf", log(10.0, lit(n) / col("__docs")))

    // word vectors + information gain over DISTINCT words only (the word
    // vectorizer is the module boundary, like the text embedder hook)
    val vecU = udf((w: String) => wordVec(w).toSeq)
    val tVecs = typedLit(targets.map(_._2.toSeq))
    val wordStats = occ.select(col("__w")).distinct()
      .withColumn("__wv", vecU(col("__w")))
      .withColumn("__dists",
        transform(tVecs, tv => VectorFunctions.cosineDistance(tv, col("__wv"))))
      .withColumn("__ig",
        aggregate(col("__dists"), lit(0.0), (a, x) => a + x) / size(col("__dists"))
          - array_min(col("__dists")))
      .select(col("__w"), col("__wv"), col("__ig"))

    val wDoc = Window.partitionBy(col("__id"))
    val ranked = occ.join(wordStats, Seq("__w")).join(dfIdf, Seq("__w"))
      .withColumn("__tfidf", (col("__cnt").cast("double") / col("__dl")) * col("__idf"))
      .withColumn("__rnIg", row_number().over(
        wDoc.orderBy(col("__ig").desc, col("__w").asc)))
      .withColumn("__rnTf", row_number().over(
        wDoc.orderBy(col("__tfidf").desc, col("__w").asc)))
      .withColumn("__nw", count(lit(1)).over(wDoc))
      .withColumn("__cutIg",
        (lit(igCutoffPercentile) / lit(100.0) * col("__nw")).cast("int"))
      .withColumn("__cutTf",
        (lit(tfidfCutoffPercentile) / lit(100.0) * col("__nw")).cast("int"))
      .withColumn("__inIg", col("__rnIg") <= col("__cutIg"))
      .withColumn("__inTf", col("__rnTf") <= col("__cutTf"))
      .withColumn("__boost",
        when(!col("__inIg"), lit(1.0))
          .when(col("__rnIg") === 1, lit(igMaximumBoost))
          .otherwise(least(lit(igMaximumBoost),
            lit(1.0) - log((col("__rnIg") - 1).cast("double") / col("__cutIg")))))
      .withColumn("__selCnt", sum(
        when(col("__inIg") && col("__inTf"), col("__cnt")).otherwise(lit(0L))).over(wDoc))
      .withColumn("__weight",
        when(col("__selCnt") >= minimumUsableWords,
          when(col("__inIg") && col("__inTf"), col("__boost") * col("__cnt"))
            .otherwise(lit(0.0)))
          .otherwise( // fallback: top-N IG-ranked words, one occurrence each
            when(col("__rnIg") <= minimumUsableWords, col("__boost"))
              .otherwise(lit(0.0))))

    // corpus vector = Σ weight·wordVec, folded straight into the per-target
    // cosine: dim-level sums s_d, then dot_t = Σ s_d·t_d and ‖s‖² = Σ s_d²
    val dimmed = ranked.filter(col("__weight") > 0)
      .select(col("__id"), col("__weight"), posexplode(col("__wv")).as(Seq("__dim", "__x")))
    val sums = dimmed.groupBy(col("__id"), col("__dim"))
      .agg(sum(col("__weight") * col("__x").cast("double")).as("__s"))
    val tNorms = targets.map { case (_, v) => math.sqrt(v.map(x => x.toDouble * x).sum) }
    val dotAggs = targets.zipWithIndex.map { case ((_, v), i) =>
      sum(col("__s") *
        element_at(typedLit(v.map(_.toDouble).toSeq), col("__dim") + 1)).as(s"__dot$i")
    } :+ sum(col("__s") * col("__s")).as("__nrm2")
    // a corpus vector can sum to exactly zero (e.g. two bag-of-words hash
    // vectors cancelling) — cosine is undefined there; the reference's Go
    // float math silently yields NaN and garbage, we DROP the row instead
    // (unclassifiable, like the no-words case)
    val perDoc = sums.groupBy(col("__id")).agg(dotAggs.head, dotAggs.tail: _*)
      .filter(col("__nrm2") > 0)
    val cands = targets.zipWithIndex.map { case ((t, _), i) =>
      struct(
        (lit(1.0) - col(s"__dot$i") / (sqrt(col("__nrm2")) * lit(tNorms(i)))).as("dist"),
        lit(t).as("target"))
    }
    val best = if (cands.size == 1) cands.head else least(cands: _*)
    perDoc.select(col("__id").as("id"),
      best.getField("target").as("target"),
      best.getField("dist").as("winning_distance"))
  }
}
