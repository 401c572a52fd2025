package graft

import org.apache.spark.sql.functions._

import graft.engine.{Collection, Graft}
import graft.model._
import graft.pipeline.{Classify, Multimodal}

/** Zero-shot classification (reference: usecases/classification zeroshot
 * path) and the nearMedia module boundary (search_get.proto:42-47). */
class MediaZeroShotSpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  private lazy val data = Seq(
    (1L, vec(1, 0, 0)), (2L, vec(0.9, 0.1, 0)),
    (3L, vec(0, 1, 0)), (4L, vec(0, 0.9, 0.2)),
    (5L, vec(0, 0, 1))).toDF("id", "v")

  private lazy val labels = Seq(
    ("x", vec(1, 0, 0)), ("y", vec(0, 1, 0)), ("z", vec(0, 0, 1)))
    .toDF("lbl", "lv")

  test("zeroShot assigns each row its nearest label prototype") {
    val out = Classify.zeroShot(data, col("id"), col("v"),
        labels, col("lbl"), col("lv"), Metric.Cosine)
      .orderBy("probe_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toSeq ===
      Seq(1L -> "x", 2L -> "x", 3L -> "y", 4L -> "y", 5L -> "z"))
    assert(out.forall(_.getDouble(2) >= 0.0))
  }

  test("zeroShot is a pure map-side projection: no shuffle, no join") {
    val plan = Classify.zeroShot(data, col("id"), col("v"),
        labels, col("lbl"), col("lv"), Metric.Cosine)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"zeroShot plan must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"zeroShot plan must not join:\n$plan")
  }

  test("zeroShot ties break (distance, label) ascending") {
    val twin = Seq(("b", vec(1, 0, 0)), ("a", vec(1, 0, 0))).toDF("lbl", "lv")
    val out = Classify.zeroShot(data.filter($"id" === 1L), col("id"), col("v"),
      twin, col("lbl"), col("lv"), Metric.Cosine).collect()
    assert(out.head.getString(1) === "a")
  }

  test("zeroShot rejects label sets beyond maxLabels") {
    val e = intercept[IllegalArgumentException] {
      Classify.zeroShot(data, col("id"), col("v"),
        labels, col("lbl"), col("lv"), Metric.Cosine, maxLabels = 2)
    }
    assert(e.getMessage.contains("maxLabels"))
  }

  private def mediaGraft: Graft = {
    val df = data.withColumnRenamed("v", "embedding")
    new Graft(spark).register(Collection(CollectionSchema("M", "id", Nil,
      vectors = Map("default" -> "embedding"),
      defaultVector = Some("default")), df))
  }

  test("nearMedia without a registered media embedder fails loudly") {
    val e = intercept[IllegalStateException] {
      mediaGraft.get(GetParams("M",
        nearMedia = Some(NearMedia(MediaKind.Image, Array[Byte](1, 2, 3)))))
    }
    assert(e.getMessage.contains("media embedder"))
  }

  test("aggregate scopes to nearMedia top-N through the shared resolution path") {
    val g = mediaGraft.withMediaEmbedder((_, _) => vec(1, 0, 0))
    val out = g.aggregate(AggregateParams("M",
      includeMetaCount = true,
      nearMedia = Some(NearMedia(MediaKind.Image, Array[Byte](9))),
      objectLimit = Some(2))).collect()
    assert(out.head.getAs[Long]("meta_count") === 2L)
  }

  test("nearMedia resolves through the module hook to a nearVector search") {
    val g = mediaGraft.withMediaEmbedder(Multimodal.stubEmbedder(3))
    val payload = "img-bytes".getBytes("UTF-8")
    val viaMedia = g.get(GetParams("M",
      nearMedia = Some(NearMedia(MediaKind.Image, payload, metric = Metric.L2Squared)),
      pagination = Some(Pagination(limit = 3)),
      properties = Seq("id"), additional = Set("distance"))).collect()
    val qv = Multimodal.stubEmbedder(3)(MediaKind.Image, payload)
    val viaVector = g.get(GetParams("M",
      nearVector = Some(NearVector(qv, Metric.L2Squared)),
      pagination = Some(Pagination(limit = 3)),
      properties = Seq("id"), additional = Set("distance"))).collect()
    assert(viaMedia.map(_.toSeq).toSeq === viaVector.map(_.toSeq).toSeq)
    // modality is folded into the stub hash: same bytes, different tower
    val audio = Multimodal.stubEmbedder(3)(MediaKind.Audio, payload)
    assert(!audio.sameElements(qv))
  }
}
