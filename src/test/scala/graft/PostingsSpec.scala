package graft

import org.apache.spark.sql.functions._

import graft.model.{Bm25, GetParams, Pagination, SearchOperator, Where}
import graft.operators.{Bm25Search, Postings}

/** The postings-table BM25 path must reproduce the scan path bit-for-bit
 * (same formula, different physical plan). */
class PostingsSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("postings search == scan search (scores within 1e-9, same order)") {
    val g = Fixtures.graft(spark, sf)
    val c = g.collection("Document")
    val idx = Postings.build(c, "text")
    for (q <- Seq("spark join stream", "table scan")) {
      val scan = Bm25Search.search(c, Bm25(q, Seq("text")), 20)
        .select(col("doc_id"), col(Bm25Search.ScoreCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val posted = Postings.search(idx, q, 20)
        .select(col("doc_id"), col(Bm25Search.ScoreCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(scan.map(_._1).toSeq == posted.map(_._1).toSeq, s"doc order differs for '$q'")
      scan.zip(posted).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("block-max pruned search (WAND analogue) is exact vs unpruned") {
    val g = Fixtures.graft(spark, sf)
    val c = g.collection("Document")
    val idx = Postings.build(c, "text", buckets = 16)
    for (q <- Seq("spark join stream", "window dup", "table hash merge sort")) {
      val full = Postings.search(idx, q, 15)
        .select(col("doc_id"), col(Bm25Search.ScoreCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val pruned = Postings.searchPruned(idx, q, 15)
        .select(col("doc_id"), col(Bm25Search.ScoreCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(full.map(_._1) == pruned.map(_._1), s"doc order differs for '$q'")
      full.zip(pruned).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("postings And-operator matches scan path") {
    val g = Fixtures.graft(spark, sf)
    val c = g.collection("Document")
    val idx = Postings.build(c, "text")
    val scan = Bm25Search.search(c, Bm25("table scan merge", Seq("text"),
      SearchOperator.AndOp), 50).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val posted = Postings.search(idx, "table scan merge", 50, SearchOperator.AndOp)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(scan == posted)
  }

  // --- engine-facade routing (reference: BM25 is always index-served,
  // BlockMax on by default — inverted/bm25_searcher.go:183-193) -------------

  private def engineHits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select(col("doc_id"), round(col("_score"), 9)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("engine bm25 leg serves from the registered postings index (plan has no corpus tokenization)") {
    val g = Fixtures.graft(spark, sf)
    val params = GetParams("Document",
      bm25 = Some(Bm25("spark join stream window", properties = Seq("text"))),
      pagination = Some(Pagination(limit = 20)),
      properties = Seq("doc_id"), additional = Set("score"))
    val served = g.get(params)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("__tok_"),
      "engine bm25 plan re-tokenizes the corpus — postings index not routed")
    assert(plan.contains("InMemoryTableScan") || plan.contains("__bucket"),
      "engine bm25 plan shows no postings-table scan")
    // parity vs the scan path on the same params
    val scan = Bm25Search.search(g.collection("Document"),
      Bm25("spark join stream window", Seq("text")), 20)
      .select(col("doc_id"), round(col(Bm25Search.ScoreCol), 9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(engineHits(served) == scan)
  }

  test("engine bm25 with a where-filter applies the allowlist before scoring (postings path)") {
    val g = Fixtures.graft(spark, sf)
    val where = Where.gtInt("n_chars", 60)
    val served = g.get(GetParams("Document",
      where = Some(where),
      bm25 = Some(Bm25("spark join stream", properties = Seq("text"))),
      pagination = Some(Pagination(limit = 15)),
      properties = Seq("doc_id"), additional = Set("score")))
    assert(!served.queryExecution.executedPlan.toString.contains("__tok_"))
    val c = g.collection("Document")
    val filtered = c.df.filter(col("n_chars") > 60)
    val scan = Bm25Search.search(c, Bm25("spark join stream", Seq("text")), 15, Some(filtered))
      .select(col("doc_id"), round(col(Bm25Search.ScoreCol), 9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(engineHits(served) == scan)
  }

  test("engine serves a scored-prop SUBSET from a wider index (per-property posting lists)") {
    // DocVec's index covers (text, lang, source); scoring only `text` takes
    // the subset path: df re-aggregated from the term-pruned postings
    val g = Fixtures.graft(spark, sf)
    val served = g.get(GetParams("DocVec",
      bm25 = Some(Bm25("spark join", properties = Seq("text"))),
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("doc_id"), additional = Set("score")))
    assert(!served.queryExecution.executedPlan.toString.contains("__tok_"),
      "subset query should be index-served")
    val scan = Bm25Search.search(g.collection("DocVec"),
      Bm25("spark join", Seq("text")), 10)
      .select(col("doc_id"), round(col(Bm25Search.ScoreCol), 9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(engineHits(served) == scan)
  }

  test("engine pruned arm (large-corpus planner choice) keeps exact parity") {
    // cutoff 0 forces the block-max pruned arm through the engine facade
    val g0 = Fixtures.graft(spark, sf)
    val eng = new graft.engine.Graft(spark).withPostingsPruneCutoff(0)
    eng.register(g0.collection("Document"))
    eng.registerPostings("Document", Seq("text"), buckets = 16)
    val served = eng.get(GetParams("Document",
      bm25 = Some(Bm25("spark join stream window", properties = Seq("text"))),
      pagination = Some(Pagination(limit = 20)),
      properties = Seq("doc_id"), additional = Set("score")))
    assert(!served.queryExecution.executedPlan.toString.contains("__tok_"))
    val scan = Bm25Search.search(g0.collection("Document"),
      Bm25("spark join stream window", Seq("text")), 20)
      .select(col("doc_id"), round(col(Bm25Search.ScoreCol), 9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(engineHits(served) == scan)
  }

  test("engine falls back to the scan path when the collection has no postings index") {
    val g = Fixtures.graft(spark, sf)
    val served = g.get(GetParams("Part",
      bm25 = Some(Bm25("widget bolt", properties = Seq("p_name"))),
      pagination = Some(Pagination(limit = 5)),
      properties = Seq("p_partkey"), additional = Set("score")))
    assert(served.queryExecution.executedPlan.toString.contains("__tok_"),
      "unindexed collection should take the scan path")
    assert(served.count() > 0)
  }

  test("engine hybrid sparse leg routes through the postings index") {
    val g = Fixtures.graft(spark, sf)
    val gg = g // DocVec has text + vector
    val anchor = Fixtures.anchorVector(gg, 7L)
    val served = gg.get(GetParams("DocVec",
      hybrid = Some(graft.model.Hybrid("spark join stream", vector = Some(anchor),
        alpha = 0.5, fusionType = graft.model.FusionType.Ranked)),
      pagination = Some(Pagination(limit = 15)),
      properties = Seq("doc_id"), additional = Set("score")))
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("__tok_"),
      "hybrid sparse leg re-tokenizes the corpus — postings index not routed")
    assert(served.count() == 15)
  }

  // --- incremental maintenance (delta — the async-indexing-queue analogue) --

  test("delta(upsert+delete) == fresh rebuild (postings, stats, pruned search)") {
    val g = Fixtures.graft(spark, sf)
    val c0 = g.collection("Document")
    val idx0 = Postings.build(c0, Seq("text"), buckets = 16)

    // mutation: replace doc 3, delete doc 7, add two new docs
    val changed = c0.df.filter(col("doc_id") === 3L)
      .withColumn("text", lit("replacement text about spark window merge"))
      .unionByName(
        c0.df.limit(2).withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", lit("fresh appended document about stream join")))
    val removed = c0.df.filter(col("doc_id") === 7L).select(col("doc_id"))
    val newDf = c0.df.filter(col("doc_id") =!= 3L && col("doc_id") =!= 7L)
      .unionByName(changed)
    val c1 = graft.engine.Collection(c0.schema, newDf)

    val viaDelta = Postings.delta(idx0, c1, changed, Some(removed))
    val fresh    = Postings.build(c1, Seq("text"), buckets = 16)

    assert(viaDelta.nDocs == fresh.nDocs)
    viaDelta.propMeans.zip(fresh.propMeans).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    assert(viaDelta.storeVersion == c1.version)

    for (q <- Seq("spark join stream", "replacement window", "fresh appended")) {
      val a = Postings.searchPruned(viaDelta, q, 15)
        .select(col("doc_id"), round(col(Bm25Search.ScoreCol), 9))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = Postings.searchPruned(fresh, q, 15)
        .select(col("doc_id"), round(col(Bm25Search.ScoreCol), 9))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b, s"delta vs rebuild differ for '$q'")
    }
    // deleted doc is gone, replaced doc scores under its NEW text only
    val hits = Postings.search(viaDelta, "replacement", 50)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(hits.contains(3L))
    val gone = Postings.search(viaDelta, "spark join stream window table", 10000)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!gone.contains(7L))
  }

  test("registered prebuilt index goes stale with the store version and the engine re-serves") {
    // spec-registered postings REBUILD on a new store version (storeId gate)
    val g = Fixtures.graft(spark, sf)
    val c = g.collection("Document")
    val idx = g.postingsFor(c).get
    assert(idx.storeVersion == c.version)
    assert(g.postingsFor(c).get eq idx, "same store version must reuse the built index")
  }
}
