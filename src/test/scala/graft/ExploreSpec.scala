package graft

import graft.engine.Graft
import graft.model._
import graft.operators.Explore

/** Cross-class Explore pagination + certainty semantics (reference:
 * traverser_explore_concepts.go:27 default limit 20; ExploreParams.Offset;
 * traverser_validate_distance_metrics.go:92-104 — certainty only with
 * cosine). */
class ExploreSpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  private def engine(): Graft = {
    val a = (0 until 30).map(i => (i.toLong, Seq(1f, i / 30f, 0f))).toDF("id", "v")
    val b = (0 until 30).map(i => (i.toLong, Seq(0f, 1f, i / 30f))).toDF("id", "v")
    val eng = new Graft(spark)
    eng.register(CollectionSchema("A", "id", Seq.empty,
      vectors = Map("default" -> "v"), defaultVector = Some("default")), a)
    eng.register(CollectionSchema("B", "id", Seq.empty,
      vectors = Map("default" -> "v"), defaultVector = Some("default")), b)
    eng
  }

  test("limit 0 means the reference default of 20") {
    assert(Explore(engine(), Seq("A", "B"), vec(1, 0, 0), Metric.Cosine).count() == 20)
  }

  test("offset pages through the MERGED cross-class ranking") {
    val eng = engine()
    val all = Explore(eng, Seq("A", "B"), vec(1, 0, 0), Metric.Cosine, limit = 12)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val page2 = Explore(eng, Seq("A", "B"), vec(1, 0, 0), Metric.Cosine,
      limit = 5, offset = 7).collect().map(r => (r.getString(0), r.getString(1)))
    assert(page2.toSeq == all.slice(7, 12).toSeq)
  }

  test("certainty thresholds the merged list; non-cosine certainty is refused") {
    val eng = engine()
    val out = Explore(eng, Seq("A", "B"), vec(1, 0, 0), Metric.Cosine,
      limit = 60, certainty = Some(0.8)).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(2) <= 2.0 * (1.0 - 0.8) + 1e-9))
    // certainty validity follows the CONFIGURED class metric
    // (traverser_validate_distance_metrics.go — the distType is class
    // config, not a query argument); an all-l2 bed refuses certainty
    val l2 = engineWith(Metric.L2Squared)
    val e = intercept[IllegalArgumentException] {
      Explore(l2, Seq("A", "B"), vec(1, 0, 0), Metric.L2Squared,
        limit = 10, certainty = Some(0.8))
    }
    assert(e.getMessage.contains(
      "can't compute and return certainty when vector index is configured with"))
  }

  private def engineWith(m: Metric): Graft = {
    val a = (0 until 5).map(i => (i.toLong, Seq(1f, i / 5f, 0f))).toDF("id", "v")
    val eng = new Graft(spark)
    Seq("A", "B").foreach(n =>
      eng.register(CollectionSchema(n, "id", Seq.empty,
        vectors = Map("default" -> "v"), defaultVector = Some("default"),
        vectorMetrics = Map("default" -> m)), a))
    eng
  }

  test("mixed configured metrics reject cross-class search verbatim") {
    val a = (0 until 5).map(i => (i.toLong, Seq(1f, i / 5f, 0f))).toDF("id", "v")
    val eng = new Graft(spark)
    eng.register(CollectionSchema("A", "id", Seq.empty,
      vectors = Map("default" -> "v"), defaultVector = Some("default"),
      vectorMetrics = Map("default" -> Metric.L2Squared)), a)
    eng.register(CollectionSchema("B", "id", Seq.empty,
      vectors = Map("default" -> "v"), defaultVector = Some("default")), a)
    val e = intercept[IllegalArgumentException] {
      Explore(eng, Seq("A", "B"), vec(1, 0, 0), Metric.Cosine, limit = 5)
    }
    assert(e.getMessage ==
      "vector search across classes not possible: found different distance " +
      "metrics: class 'A' uses distance metric 'l2-squared', " +
      "class 'B' uses distance metric 'cosine'")
  }
}
