package graft

import org.apache.spark.sql.functions._

import graft.engine.{Collection, Graft}
import graft.model._
import graft.operators.Rerank

/** Rerank `_additional` semantics (reference:
 * usecases/modulecomponents/additional/rank/rank_result.go:30-86). */
class RerankSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma", "en"),
    (2L, "alpha beta",       "en"),
    (3L, "alpha",            "en"),
    (4L, "delta only here",  "en"),
    (5L, null.asInstanceOf[String], "en")
  ).toDF("doc_id", "text", "lang")

  private def engine: Graft =
    new Graft(spark).register(Collection(CollectionSchema("Doc", "doc_id", Seq(
      Property("text", PropType.Text, Tokenization.Word),
      Property("lang", PropType.Text, Tokenization.Field))), docs))

  test("lexical-overlap scorer: fraction of query terms present as whole words") {
    val scored = docs.withColumn("s", Rerank.lexicalOverlap(col("text"), "alpha beta gamma"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(1L) == 1.0)
    assert(math.abs(scored(2L) - 2.0 / 3) < 1e-12)
    assert(math.abs(scored(3L) - 1.0 / 3) < 1e-12)
    assert(scored(4L) == 0.0) // no term matches; "here" is not queried
    assert(scored(5L) == 0.0) // null property = empty document
  }

  test("whole-word match only — substrings don't count") {
    val d = Seq((1L, "alphabet soup")).toDF("doc_id", "text")
    val s = d.withColumn("s", Rerank.lexicalOverlap(col("text"), "alpha"))
      .head().getDouble(2)
    assert(s == 0.0)
  }

  test("rerank re-sorts the page desc by score, id-asc tie-break") {
    val out = engine.get(GetParams("Doc",
      pagination = Some(Pagination(limit = 5)),
      properties = Seq("doc_id"),
      additional = Set("rerank"),
      rerank = Some(RerankParams("text", "alpha beta gamma"))))
    assert(out.columns.contains(Rerank.ScoreCol))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSeq
    // scores: 1→1.0, 2→0.667, 3→0.333, 4→0.0, 5→0.0 (tie → id asc)
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("rerank runs AFTER pagination: limit bounds the rerank input") {
    // page = first 2 by id order; doc 1 (best match) is outside the page? No —
    // ids 1,2 are the page; doc with top score OUTSIDE the page must not appear
    val out = engine.get(GetParams("Doc",
      pagination = Some(Pagination(offset = 2, limit = 3)),
      properties = Seq("doc_id"),
      rerank = Some(RerankParams("text", "alpha beta gamma"))))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L, 4L, 5L)) // docs 1,2 were paged out before rerank
  }

  test("custom reranker module is pluggable (withReranker)") {
    val byLength: Rerank.Scorer = (doc, _) => coalesce(length(doc).cast("double"), lit(0.0))
    val out = engine.withReranker(byLength).get(GetParams("Doc",
      pagination = Some(Pagination(limit = 5)),
      properties = Seq("doc_id"),
      rerank = Some(RerankParams("text", "ignored"))))
    val first = out.select("doc_id").head().getLong(0)
    assert(first == 1L) // "alpha beta gamma" is the longest text
  }

  test("non-text rerank property rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      engine.get(GetParams("Doc",
        pagination = Some(Pagination(limit = 5)),
        rerank = Some(RerankParams("nope", "q"))))
    }
    assert(e.getMessage.contains("unknown rerank property"))
  }
}
