package graft

import org.apache.spark.sql.functions._

import graft.engine.Collection
import graft.model._
import graft.operators.{Bm25Search, Postings}

/**
 * Pins the BM25F scoring model to the reference's OWN expected values
 * (adapters/repos/db/bm25f_test.go): the corpus is SetupClass's test data
 * (bm25f_test.go:153-163), the expected scores/orders are the test
 * assertions. This is the guard against the model drifting from upstream:
 *
 *  - exact scores (float32-printed in the reference, asserted to 1e-5 here):
 *    the "With autocut" block, bm25f_test.go:497-505 — single prop,
 *    k1=1.2 b=0.75;
 *  - boosted multi-prop scores AND order: TestBM25FWithFilters-adjacent
 *    boosted block, bm25f_test.go:770-795 — title^2 + description with the
 *    class configured at k1=0.5 b=100 (yes, b=100: the saturation must
 *    reproduce the reference's arithmetic verbatim, including "insane"
 *    parameter ranges);
 *  - rank orders: "Check search with two terms" (bm25f_test.go:391-401) and
 *    "Results from three properties" (bm25f_test.go:446-455).
 *
 * Each case runs the SCAN path (Bm25Search) and the POSTINGS path
 * (Postings.search / searchPruned) and requires them to agree to 1e-9 —
 * the planner's "the index answers exactly what the scan answers" invariant,
 * here on the reference's own corpus (PostingsParityProps covers random
 * corpora).
 *
 * These fixed expected values decode the model pinned in Bm25.scala's
 * header: unique-term prop lengths, boost inside the frequency, cross-prop
 * frequency/length merge before ONE saturation, pooled average prop length.
 * Any alternative (per-prop saturation, boost outside, total-token lengths)
 * reproduces NONE of the five autocut digits.
 */
class Bm25fReferenceParitySpec extends SparkSpecBase {
  import spark.implicits._

  // SetupClass test data, bm25f_test.go:153-163 (docID = insertion order)
  private lazy val coll: Collection = {
    val rows = Seq(
      (0L, "Our journey to BM25F", "This is how we get to BM25F", "none none none"),
      (1L, "Why I dont like journey", "This is about how we get somewhere", null),
      (2L, "My journeys in Journey", "A journey story about journeying", null),
      (3L, "An unrelated title", "Actually all about journey", null),
      (4L, "journey journey", "journey journey journey", null),
      (5L, "journey", "journey journey", null),
      (6L, "JOURNEY", "A LOUD JOURNEY", null),
      (7L, "An unrelated title", "Absolutely nothing to do with the topic", null),
      (8L, "none", "other", null),
      (9L, "something", "none none", "none none none none none none"))
      .toDF("id", "title", "description", "review")
    Collection(CollectionSchema("MyClass", "id", Seq(
      Property("title", PropType.Text),
      Property("description", PropType.Text),
      Property("review", PropType.Text))), rows)
  }

  private lazy val idx = Postings.build(coll, Seq("title", "description", "review"), buckets = 4)

  private def scanHits(params: Bm25, limit: Int = 10): Seq[(Long, Double)] =
    Bm25Search.search(coll, params, limit)
      .select($"id", col(Bm25Search.ScoreCol))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq

  private def postingsHits(params: Bm25, limit: Int = 10, pruned: Boolean = false): Seq[(Long, Double)] = {
    val specs = Bm25Search.parseProps(params.properties)
    val boosts = specs.map(s => s.name -> s.boost).toMap
    val f = if (pruned) Postings.searchPruned _ else Postings.search _
    f(idx, params.query, limit, params.searchOperator, params.k1, params.b,
      None, boosts, Some(specs.map(_.name)))
      .select($"id", col(Bm25Search.ScoreCol))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
  }

  private def assertAgree(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Unit = {
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, x), (_, y)) => assert(math.abs(x - y) < 1e-9, s"$x vs $y") }
  }

  test("reference expected scores: single prop, k1=1.2 b=0.75 (bm25f_test.go:497-505)") {
    val params = Bm25("journey", Seq("description"))
    val scan = scanHits(params)
    assert(scan.map(_._1) == Seq(4L, 5L, 6L, 3L, 2L))
    val expected = Seq(0.5868752, 0.5450892, 0.34149727, 0.3049518, 0.27547202)
    scan.map(_._2).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-5, s"$got vs reference $want")
    }
    assertAgree(scan, postingsHits(params))   // subset of the index's props
  }

  test("reference expected scores: title^2 + description, k1=0.5 b=100 (bm25f_test.go:770-795)") {
    val params = Bm25("journey", Seq("title^2", "description"), k1 = 0.5, b = 100)
    val scan = scanHits(params)
    assert(scan.head._1 == 6L)   // res[0].DocID == 6
    assert(scan(3)._1 == 1L)     // res[3].DocID == 1
    // EqualFloats(0.06023, scores[0], 6) / EqualFloats(0.04238, scores[1], 6):
    // the reference computes in float32; 3e-5 covers the widening to double
    assert(math.abs(scan(0)._2 - 0.06023) < 3e-5, s"${scan(0)._2}")
    assert(math.abs(scan(1)._2 - 0.04238) < 3e-5, s"${scan(1)._2}")
    assertAgree(scan, postingsHits(params))
    // b=100 is outside the range where block-max pruning is provably sound —
    // searchPruned must detect that and still answer exactly (via fallback)
    assertAgree(scan, postingsHits(params, pruned = true))
  }

  test("reference rank order: two terms over two props (bm25f_test.go:391-401)") {
    val params = Bm25("journey somewhere", Seq("title", "description"))
    val scan = scanHits(params)
    assert(scan.take(5).map(_._1) == Seq(1L, 4L, 5L, 6L, 2L))
    assertAgree(scan, postingsHits(params))
  }

  test("reference rank order: three properties (bm25f_test.go:446-455)") {
    val params = Bm25("none", Seq("title", "description", "review"))
    val scan = scanHits(params, limit = 5)
    assert(scan.map(_._1) == Seq(9L, 0L, 8L))
    assertAgree(scan, postingsHits(params, limit = 5))           // full set → dictionary df
    assertAgree(scan, postingsHits(params, limit = 5, pruned = true)) // sane params → real pruning
  }

  test("duplicate query terms multiply idf (bm25_searcher.go:663,972 duplicateTextBoost)") {
    val once  = scanHits(Bm25("journey", Seq("description")))
    val twice = scanHits(Bm25("journey journey", Seq("description")))
    assert(once.map(_._1) == twice.map(_._1))
    once.zip(twice).foreach { case ((_, s1), (_, s2)) =>
      assert(math.abs(s2 - 2 * s1) < 1e-9)
    }
    assertAgree(twice, postingsHits(Bm25("journey journey", Seq("description"))))
  }

  test("cleanup (release cached side tables)") {
    idx.postings.unpersist(); idx.docLens.unpersist()
    idx.termDf.unpersist(); idx.maxImpact.unpersist()
    Bm25Search.invalidateStats()
  }
}
