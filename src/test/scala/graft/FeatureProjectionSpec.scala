package graft

import graft.engine.Graft
import graft.model._
import graft.operators.FeatureProjection

/** `_additional { featureProjection }` — t-SNE over the bounded result page
 * (reference: usecases/modulecomponents/additional/projector/projector.go;
 * defaults + validation projector_params.go:31-60). go-tsne's random init
 * makes the reference's floats unreproducible by design, so parity here is
 * behavioral: defaults, validation messages, determinism, shape, and
 * neighborhood preservation. */
class FeatureProjectionSpec extends SparkSpecBase {
  import spark.implicits._

  /** Two tight gaussian clusters around ±5·𝟙 in d dims. */
  private def clustered(n: Int, d: Int = 8): (Array[Array[Float]], Array[Int]) = {
    val rnd = new scala.util.Random(7)
    val labels = Array.tabulate(n)(_ % 2)
    val vecs = labels.map { l =>
      val c = if (l == 0) 5.0 else -5.0
      Array.fill(d)((c + 0.1 * rnd.nextGaussian()).toFloat)
    }
    (vecs, labels)
  }

  test("reduce: n x dimensions shape, deterministic, finite, re-centered") {
    val (vecs, _) = clustered(20)
    val p = FeatureProjectionParams()
    val a = FeatureProjection.reduce(vecs, p)
    val b = FeatureProjection.reduce(vecs, p)
    assert(a.length == 20 && a.forall(_.length == 2))
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "same input must project identically (seeded init)")
    assert(a.flatten.forall(java.lang.Float.isFinite))
    val mean = Array(a.map(_(0).toDouble).sum / 20, a.map(_(1).toDouble).sum / 20)
    assert(mean.forall(m => math.abs(m) < 1e-3), s"not re-centered: ${mean.toSeq}")
  }

  test("reduce: separated clusters stay separated in the projection") {
    val (vecs, labels) = clustered(30)
    val y = FeatureProjection.reduce(vecs, FeatureProjectionParams())
    def d2(i: Int, j: Int): Double =
      y(i).zip(y(j)).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
    val idx = y.indices
    val violations = idx.count { i =>
      val same = idx.filter(j => j != i && labels(j) == labels(i)).map(d2(i, _))
      val cross = idx.filter(j => labels(j) != labels(i)).map(d2(i, _))
      !(same.sum / same.size < cross.sum / cross.size)
    }
    assert(violations == 0,
      s"$violations/30 points closer to the other cluster on average")
  }

  test("degenerates: empty input and a single point") {
    val p = FeatureProjectionParams(dimensions = 3)
    assert(FeatureProjection.reduce(Array.empty, p).isEmpty)
    val one = FeatureProjection.reduce(Array(Array(1f, 2f)), p)
    assert(one.length == 1 && one.head.toSeq == Seq(0f, 0f, 0f))
  }

  test("validation: reference-shaped messages (projector_params.go:41-60)") {
    val (vecs, _) = clustered(4)
    def msg(p: FeatureProjectionParams): String =
      intercept[IllegalArgumentException](FeatureProjection.reduce(vecs, p)).getMessage
    assert(msg(FeatureProjectionParams(algorithm = "pca"))
      .contains("algorithm pca is not supported: must be one of: tsne"))
    assert(msg(FeatureProjectionParams(perplexity = Some(4)))
      .contains("perplexity must be smaller than amount of items: 4 >= 4"))
    assert(msg(FeatureProjectionParams(iterations = 0))
      .contains("iterations must be at least 1, got: 0"))
    assert(msg(FeatureProjectionParams(learningRate = 0))
      .contains("learningRate must be at least 1, got: 0"))
    assert(msg(FeatureProjectionParams(dimensions = 0))
      .contains("dimensions must be at least 1, got: 0"))
    // default perplexity is min(n-1, 5), so n=4 with no explicit perplexity
    // is VALID there (3 < 4) — and here
    assert(FeatureProjection.reduce(vecs, FeatureProjectionParams()).length == 4)
  }

  test("engine: _additional featureProjection decorates the page, page rule enforced") {
    val (vecs, labels) = clustered(40, d = 6)
    val rows = vecs.toSeq.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.toSeq, labels(i).toLong)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val eng = new Graft(spark)
    eng.register(CollectionSchema("E", "vec_id",
      Seq(Property("label", PropType.Int)),
      vectors = Map("default" -> "embedding"), defaultVector = Some("default")), emb)

    // requesting the _additional alone triggers default params (the GraphQL
    // `_additional { featureProjection { vector } }` shape)
    val page = eng.get(GetParams("E",
      nearVector = Some(NearVector(vecs(0), Metric.L2Squared)),
      pagination = Some(Pagination(limit = 12)),
      properties = Seq("vec_id", "label"),
      additional = Set("featureProjection")))
    val got = page.collect()
    assert(got.length == 12)
    assert(page.columns.contains(FeatureProjection.Col))
    val coords = got.map(r => r.getSeq[Float](r.fieldIndex(FeatureProjection.Col)))
    assert(coords.forall(c => c.length == 2 && c.forall(java.lang.Float.isFinite)),
      "every page row carries a finite 2-d projection")

    // the decoration must not disturb the page itself: same ids as the bare query
    val bare = eng.get(GetParams("E",
      nearVector = Some(NearVector(vecs(0), Metric.L2Squared)),
      pagination = Some(Pagination(limit = 12)),
      properties = Seq("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_.getLong(0)).toSet == bare)

    // explicit params: 3 output dimensions
    val p3 = eng.get(GetParams("E",
      nearVector = Some(NearVector(vecs(0), Metric.L2Squared)),
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("vec_id"),
      additional = Set("featureProjection"),
      featureProjection = Some(FeatureProjectionParams(dimensions = 3))))
    assert(p3.collect().forall(
      _.getSeq[Float](p3.columns.indexOf(FeatureProjection.Col)).length == 3))

    // driver-side reduction over an unbounded result is refused, like
    // generate.groupedTask (the page is what the reference's module sees)
    val err = intercept[IllegalArgumentException] {
      eng.get(GetParams("E", properties = Seq("vec_id"),
        additional = Set("featureProjection")))
    }
    assert(err.getMessage.contains("featureProjection requires a bounded page"))
  }
}
