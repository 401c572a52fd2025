package graft

import graft.engine.Graft
import graft.model._
import graft.operators.Movements

/** nearText moveTo/moveAwayFrom with OBJECT moves (reference:
 * entities/searchparams/retrieval.go:137-146 ObjectMove;
 * usecases/modulecomponents/arguments/nearText/searcher.go:55-139 — a move
 * applies only with force > 0 and at least one value or object; its vector
 * is the mean of [the ONE combined values vector] ++ [each object's stored
 * vector]). */
class NearTextMoveSpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  // deterministic 3-d "embedder": a distinct axis per known concept
  private val embed: String => Array[Float] = {
    case "red"   => vec(1, 0, 0)
    case "green" => vec(0, 1, 0)
    case "blue"  => vec(0, 0, 1)
    case other   => vec(other.length.toDouble, 1, 1)
  }

  private lazy val rows = Seq(
    (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f)),
    (3L, Seq(0f, 1f, 0f)), (4L, Seq(0f, 0.9f, 0.2f)),
    (5L, Seq(0f, 0f, 1f)), (6L, Seq(0.1f, 0f, 0.95f))).toDF("id", "v")

  private def engine(): Graft = {
    val eng = new Graft(spark).withEmbedder(embed)
    eng.register(CollectionSchema("C", "id", Seq.empty,
      vectors = Map("default" -> "v"), defaultVector = Some("default")), rows)
    eng
  }

  private def page(eng: Graft, nt: NearText): Seq[Long] =
    eng.get(GetParams("C", nearText = Some(nt),
      pagination = Some(Pagination(limit = 6)), properties = Seq("id")))
      .collect().map(_.getLong(0)).toSeq

  /** The manual model: nearVector with the expected moved query vector. */
  private def manual(eng: Graft, qv: Array[Float]): Seq[Long] =
    eng.get(GetParams("C", nearVector = Some(NearVector(qv)),
      pagination = Some(Pagination(limit = 6)), properties = Seq("id")))
      .collect().map(_.getLong(0)).toSeq

  test("object-only move pulls toward the object's stored vector") {
    val eng = engine()
    val got = page(eng, NearText(Seq("red"),
      moveTo = Some(MoveParams(Nil, force = 0.8, objects = Seq(5L)))))
    // move vector = the stored vector of id 5 alone (no concepts part)
    val expected = manual(eng, Movements.moveTo(embed("red"), vec(0, 0, 1), 0.8))
    assert(got == expected)
    // and the move matters: without it the ranking differs
    assert(got != page(eng, NearText(Seq("red"))))
  }

  test("values + objects: values count ONCE as a group, objects once each") {
    val eng = engine()
    val got = page(eng, NearText(Seq("red"),
      moveTo = Some(MoveParams(Seq("green", "blue"), force = 0.6,
        objects = Seq(5L, 3L)))))
    // searcher.go:99-139: mean of [centroid(green, blue)] ++ [v5] ++ [v3]
    val groupVec = Movements.centroid(Seq(embed("green"), embed("blue")))
    val moveVec = Movements.centroid(Seq(groupVec, vec(0, 0, 1), vec(0, 1, 0)))
    assert(got == manual(eng, Movements.moveTo(embed("red"), moveVec, 0.6)))
  }

  test("moveAwayFrom with objects pushes away from the stored vector") {
    val eng = engine()
    val got = page(eng, NearText(Seq("red"),
      moveAwayFrom = Some(MoveParams(Nil, force = 0.5, objects = Seq(2L)))))
    assert(got == manual(eng,
      Movements.moveAwayFrom(embed("red"), vec(0.9f, 0.1f, 0f), 0.5)))
  }

  test("force = 0 or an empty move is a no-op (searcher.go:67,82 gate)") {
    val eng = engine()
    val plain = page(eng, NearText(Seq("red")))
    assert(page(eng, NearText(Seq("red"),
      moveTo = Some(MoveParams(Seq("blue"), force = 0.0)))) == plain)
    assert(page(eng, NearText(Seq("red"),
      moveTo = Some(MoveParams(Nil, force = 0.9, objects = Nil)))) == plain)
  }

  test("hybrid top-level nearText leg resolves like a raw vector (incl. object move)") {
    val words = Seq("alpha beta", "beta gamma", "gamma delta", "delta epsilon",
      "epsilon zeta", "zeta eta")
    val docs = rows.withColumn("txt",
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.typedLit(words),
        org.apache.spark.sql.functions.col("id").cast("int")))
    val eng = new Graft(spark).withEmbedder(embed)
    eng.register(CollectionSchema("H", "id",
      Seq(Property("txt", PropType.Text)),
      vectors = Map("default" -> "v"), defaultVector = Some("default")), docs)
    val nt = NearText(Seq("red"),
      moveTo = Some(MoveParams(Nil, force = 0.8, objects = Seq(5L))))
    def run(h: Hybrid): Seq[Long] =
      eng.get(GetParams("H", hybrid = Some(h),
        pagination = Some(Pagination(limit = 6)), properties = Seq("id")))
        .collect().map(_.getLong(0)).toSeq
    val viaNearText = run(Hybrid("beta gamma", nearText = Some(nt),
      properties = Seq("txt"), alpha = 0.5))
    val viaVector = run(Hybrid("beta gamma",
      vector = Some(Movements.moveTo(embed("red"), vec(0, 0, 1), 0.8)),
      properties = Seq("txt"), alpha = 0.5))
    assert(viaNearText == viaVector && viaNearText.nonEmpty)
    intercept[IllegalArgumentException] {
      Hybrid("q", vector = Some(vec(1, 0, 0)), nearText = Some(nt))
    }
  }

  test("unknown move object id fails like nearObject") {
    val eng = engine()
    val e = intercept[IllegalArgumentException] {
      page(eng, NearText(Seq("red"),
        moveTo = Some(MoveParams(Nil, force = 0.5, objects = Seq(99L)))))
    }
    assert(e.getMessage.contains("99 not found"))
  }
}
