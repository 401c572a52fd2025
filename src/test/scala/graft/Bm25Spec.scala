package graft

import org.apache.spark.sql.functions._

import graft.engine.Collection
import graft.model._
import graft.operators.{Bm25Search, Postings}

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  // 4-doc corpus with hand-computable stats. Reference model (see Bm25.scala
  // header): dl = DISTINCT term count, boost folds into the frequency,
  // duplicate query terms multiply idf.
  //   unique lengths: doc1=4, doc2=2 ("spark spark everywhere"), doc3=3,
  //   doc4=3 ("fast water fast spark") → avgdl = 3.0
  private lazy val coll: Collection = {
    val df = Seq(
      (1L, "spark makes joins fast"),
      (2L, "spark spark everywhere"),
      (3L, "ducks like water"),
      (4L, "fast water fast spark")).toDF("id", "text")
    Collection(CollectionSchema("Doc", "id", Seq(Property("text", PropType.Text))), df)
  }

  private def score(q: String, op: SearchOperator = SearchOperator.Or(1)): Map[Long, Double] =
    Bm25Search.score(coll, Bm25(q, Seq("text"), op))
      .select($"id", col(Bm25Search.ScoreCol))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def bm25Ref(f: Double, dl: Double, n: Double, N: Double,
                      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (N - n + 0.5) / (n + 0.5))
    val tf = f / (f + k1 * (1 - b + b * dl / avgdl))
    idf * tf
  }

  test("single-term scores match the closed formula") {
    val s = score("spark")
    // N=4, avgdl(unique)=3.0, n_spark=3
    assert(math.abs(s(1L) - bm25Ref(1, 4, 3, 4, 3.0)) < 1e-12)
    assert(math.abs(s(2L) - bm25Ref(2, 2, 3, 4, 3.0)) < 1e-12)
    assert(math.abs(s(4L) - bm25Ref(1, 3, 3, 4, 3.0)) < 1e-12)
    assert(!s.contains(3L)) // no query term
  }

  test("multi-term scores sum per-term contributions") {
    val s = score("spark water")
    val expected1 = bm25Ref(1, 4, 3, 4, 3.0) // spark only
    val expected4 = bm25Ref(1, 3, 3, 4, 3.0) + bm25Ref(1, 3, 2, 4, 3.0)
    assert(math.abs(s(1L) - expected1) < 1e-12)
    assert(math.abs(s(4L) - expected4) < 1e-12)
    assert(s.contains(3L)) // matches "water"
  }

  test("searchOperator And requires all terms") {
    val s = score("spark water", SearchOperator.AndOp)
    assert(s.keySet == Set(4L))
  }

  test("minimumOrTokensMatch") {
    val s = score("spark water ducks", SearchOperator.Or(2))
    assert(s.keySet == Set(3L, 4L)) // doc3: water+ducks; doc4: spark+water
  }

  test("repeated query terms multiply idf (duplicateTextBoost)") {
    val s1 = score("spark")
    val s2 = score("spark spark")
    assert(s1.keySet == s2.keySet)
    for ((k, v) <- s1) assert(math.abs(s2(k) - 2 * v) < 1e-12)
  }

  test("property boost folds into the raw frequency before saturation") {
    // reference: lsmkv decode multiplies the boost into Frequency
    // (bm25_searcher.go:825) — NOT a linear post-multiplier on the score
    val s2 = Bm25Search.score(coll, Bm25("spark", Seq("text^2")))
      .select($"id", col(Bm25Search.ScoreCol)).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(s2(1L) - bm25Ref(2, 4, 3, 4, 3.0)) < 1e-12)  // f=2·1
    assert(math.abs(s2(2L) - bm25Ref(4, 2, 3, 4, 3.0)) < 1e-12)  // f=2·2
    assert(math.abs(s2(4L) - bm25Ref(2, 3, 3, 4, 3.0)) < 1e-12)
  }

  test("And threshold on multi-tokenization props is the MIN over groups (reference fold)") {
    // bm25_searcher.go:626-633: per-group thresholds (full group term count)
    // fold with MIN into one global minimum-should-match. DocVec scores text
    // (Word: "spark","join" = 2 terms) + lang (Field: whole query = 1 term)
    // → threshold min(2,1) = 1, i.e. And on these props behaves like Or(1).
    val g = Fixtures.graft(spark, "/root/testdata/sf0.001")
    val c = g.collection("DocVec")
    def ids(op: graft.model.SearchOperator): Seq[Long] =
      Bm25Search.search(c, Bm25("spark join", Seq("text", "lang"), op), 200)
        .select($"doc_id").collect().map(_.getLong(0)).toSeq
    val andIds = ids(graft.model.SearchOperator.AndOp)
    assert(andIds == ids(graft.model.SearchOperator.Or(1)),
      "multi-group And must fold thresholds with min (reference behavior)")
    // sanity: docs matching only ONE word term are included
    val both = Bm25Search.search(c, Bm25("spark join", Seq("text")),
      10000, None).count()
    assert(andIds.nonEmpty && andIds.size >= both.toInt.min(1))
    // postings path agrees
    val idx = Postings.build(c, Seq("text", "lang"), buckets = 8)
    val posted = Postings.search(idx, "spark join", 200,
      graft.model.SearchOperator.AndOp).select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(posted == andIds)
  }

  test("hybrid copies its searchOperator into the keyword leg (explorer_hybrid.go:53-55)") {
    val g = Fixtures.graft(spark, "/root/testdata/sf0.001")
    val c = g.collection("Document")
    val params = GetParams("Document",
      hybrid = Some(Hybrid("spark join stream", alpha = 0.0,
        properties = Seq("text"), searchOperator = SearchOperator.AndOp)),
      pagination = Some(Pagination(limit = 5000)),
      properties = Seq("doc_id"), additional = Set("score"))
    val got = g.get(params).select($"doc_id").collect().map(_.getLong(0)).toSet
    val want = Bm25Search.search(c,
      Bm25("spark join stream", Seq("text"), SearchOperator.AndOp), 5000)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
    val orCount = Bm25Search.search(c,
      Bm25("spark join stream", Seq("text")), 5000).count()
    assert(got.size < orCount, "sanity: And must actually prune vs the Or default")
  }

  test("AndCross: single shared tokenization behaves as full And; mixed analyzers error") {
    val g = Fixtures.graft(spark, "/root/testdata/sf0.001")
    val doc = g.collection("Document") // text + title, both Word → one group
    def ids(op: graft.model.SearchOperator): Seq[Long] =
      Bm25Search.search(doc, Bm25("spark join", Seq("text", "title"), op), 100)
        .select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids(graft.model.SearchOperator.AndCross) == ids(graft.model.SearchOperator.AndOp))
    val dv = g.collection("DocVec") // text Word + lang Field → two groups
    val e = intercept[IllegalArgumentException] {
      Bm25Search.search(dv, Bm25("spark join", Seq("text", "lang"),
        graft.model.SearchOperator.AndCross), 10).collect()
    }
    assert(e.getMessage.contains("share the same tokenization"))
  }

  test("text[] props: per-element tokenization with merged counts ≡ joined-text twin; postings agree") {
    // same token multiset, two physical shapes: chunked array vs joined text
    val arr = Seq(
      (1L, Seq("spark makes joins", "fast spark wins")),
      (2L, Seq("spark spark everywhere")),
      (3L, Seq("ducks like", null, "water")), // null element is skipped
      (4L, Seq("fast water", "fast spark"))).toDF("id", "chunks")
    val cArr = Collection(CollectionSchema("DocA", "id",
      Seq(Property("chunks", PropType.Arr(PropType.Text)))), arr)
    val joined = Seq(
      (1L, "spark makes joins fast spark wins"),
      (2L, "spark spark everywhere"),
      (3L, "ducks like water"),
      (4L, "fast water fast spark")).toDF("id", "chunks")
    val cTxt = Collection(CollectionSchema("DocT", "id",
      Seq(Property("chunks", PropType.Text))), joined)
    def scores(c: Collection): Map[Long, Double] =
      Bm25Search.score(c, Bm25("spark fast water", Seq("chunks")))
        .select($"id", col(Bm25Search.ScoreCol))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = scores(cArr)
    val t = scores(cTxt)
    assert(a.keySet == t.keySet)
    a.foreach { case (id, s) => assert(math.abs(s - t(id)) < 1e-12, s"doc $id: $s vs ${t(id)}") }
    // the postings index built over the array prop scores identically
    val idx = Postings.build(cArr, Seq("chunks"), buckets = 2)
    val viaPostings = Postings.search(idx, "spark fast water", 10, SearchOperator.Or(1))
      .select($"id", col(Bm25Search.ScoreCol))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaPostings.keySet == a.keySet)
    viaPostings.foreach { case (id, s) =>
      assert(math.abs(s - a(id)) < 1e-12, s"postings doc $id: $s vs ${a(id)}") }
  }
}
