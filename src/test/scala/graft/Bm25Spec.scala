package graft

import org.apache.spark.sql.functions._

import graft.engine.{Collection, Graft}
import graft.model._
import graft.operators.Bm25Search

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  // 4-doc corpus with hand-computable stats
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
    // N=4, avgdl=(4+3+3+4)/4=3.5, n_spark=3
    assert(math.abs(s(1L) - bm25Ref(1, 4, 3, 4, 3.5)) < 1e-12)
    assert(math.abs(s(2L) - bm25Ref(2, 3, 3, 4, 3.5)) < 1e-12)
    assert(math.abs(s(4L) - bm25Ref(1, 4, 3, 4, 3.5)) < 1e-12)
    assert(!s.contains(3L)) // no query term
  }

  test("multi-term scores sum per-term contributions") {
    val s = score("spark water")
    val expected1 = bm25Ref(1, 4, 3, 4, 3.5) // spark only
    val expected4 = bm25Ref(1, 4, 3, 4, 3.5) + bm25Ref(1, 4, 2, 4, 3.5)
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

  test("repeated query terms don't double-count") {
    assert(score("spark spark") == score("spark"))
  }

  test("property boost multiplies") {
    val s1 = Bm25Search.score(coll, Bm25("spark", Seq("text")))
      .select($"id", col(Bm25Search.ScoreCol)).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s2 = Bm25Search.score(coll, Bm25("spark", Seq("text^2")))
      .select($"id", col(Bm25Search.ScoreCol)).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((k, v) <- s1) assert(math.abs(s2(k) - 2 * v) < 1e-12)
  }
}
