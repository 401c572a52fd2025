package graft

import org.apache.spark.sql.functions._

import graft.engine.{Collection, Graft}
import graft.model._
import graft.operators.{Bm25Search, Postings}
import graft.text.Tokenize

/**
 * Stopword semantics (reference: inverted/stopwords/presets.go +
 * bm25_searcher.go:381-390 + searcher.go:899-943): the index stores all
 * tokens; word-tokenized BM25 queries and text filters drop the
 * collection's stopwords; values reduced to nothing error with
 * ErrOnlyStopwords; config = preset en/none ± additions/removals.
 */
class StopwordsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the spark engine joins the stream"),
    (2L, "a table scan is not a join"),
    (3L, "spark spark spark"),
    (4L, "window functions and windows")
  ).toDF("doc_id", "text")

  private def coll(cfg: StopwordConfig = StopwordConfig()) = Collection(
    CollectionSchema("D", "doc_id",
      Seq(Property("text", PropType.Text, Tokenization.Word)), stopwords = cfg), docs)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select($"doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("stopwordsFor: presets, additions, removals, unknown preset") {
    assert(Tokenize.stopwordsFor(StopwordConfig()) == Tokenize.StopwordsEn)
    assert(Tokenize.stopwordsFor(StopwordConfig(preset = "none")).isEmpty)
    val cfg = StopwordConfig(additions = Seq("spark"), removals = Seq("the"))
    val sw = Tokenize.stopwordsFor(cfg)
    assert(sw.contains("spark") && !sw.contains("the") && sw.contains("and"))
    intercept[IllegalArgumentException](Tokenize.stopwordsFor(StopwordConfig(preset = "de")))
  }

  test("BM25 drops stopword query terms; scores match the stopword-free query") {
    val c = coll()
    val got = Bm25Search.score(c, Bm25("the spark", Seq("text")))
      .select($"doc_id", $"_score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Bm25Search.score(c, Bm25("spark", Seq("text")))
      .select($"doc_id", $"_score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want && got.nonEmpty)
    // preset none keeps the stopword: "the" matches docs containing it
    val none = Bm25Search.score(coll(StopwordConfig(preset = "none")),
      Bm25("the", Seq("text")))
    assert(ids(none) == Seq(1L))
  }

  test("only-stopword BM25 query errors with the reference message") {
    val e = intercept[IllegalArgumentException] {
      Bm25Search.score(coll(), Bm25("the and with", Seq("text"))).collect()
    }
    assert(e.getMessage.contains("only stopwords"))
  }

  test("postings path applies the same stopword filtering as the scan path") {
    val c = coll()
    val idx = Postings.build(c, Seq("text"), buckets = 4)
    val got = Postings.search(idx, "the spark", 10)
      .select($"doc_id", col(Bm25Search.ScoreCol)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Bm25Search.score(c, Bm25("spark", Seq("text")))
      .select($"doc_id", $"_score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
    intercept[IllegalArgumentException](Postings.search(idx, "the and", 10))
  }

  test("text filters drop stopwords; all-stopword values error; ContainsAny skips") {
    val g = new Graft(spark)
    g.register(coll())
    def run(w: Where) = ids(g.get(GetParams("D", where = Some(w), properties = Seq("doc_id"))))
    // Equal "the spark" ≡ Equal "spark" (the stopword term is dropped)
    assert(run(Where.eqText("text", "the spark")) == run(Where.eqText("text", "spark")))
    assert(run(Where.eqText("text", "the spark")) == Seq(1L, 3L))
    // all-stopword Equal errors
    val e = intercept[IllegalArgumentException](run(Where.eqText("text", "the")))
    assert(e.getMessage.contains("only stopwords"))
    // ContainsAny skips the stopword-only value, keeps the usable one
    assert(run(Where.containsAnyText("text", Seq("the", "scan"))) == Seq(2L))
    // ...but errors when every value is stopwords
    intercept[IllegalArgumentException](run(Where.containsAnyText("text", Seq("the", "a"))))
  }
}
