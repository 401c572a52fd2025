package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions._

class VectorFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(4.0f, -5.0f, 6.0f)

  private def one(expr: org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(expr.as("d")).head().getDouble(0)

  test("l2 squared") {
    assert(math.abs(one(l2Squared($"a", $"b")) - (9.0 + 49.0 + 9.0)) < 1e-12)
  }

  test("cosine distance matches scalar math") {
    val dot = 4.0 - 10.0 + 18.0
    val expect = 1.0 - dot / math.sqrt(14.0 * 77.0)
    assert(math.abs(one(cosineDistance($"a", $"b")) - expect) < 1e-12)
  }

  test("cosine of zero vector is 1 (guarded)") {
    val z = Array(0.0f, 0.0f, 0.0f)
    val d = Seq((z, b)).toDF("a", "b")
      .select(cosineDistance($"a", $"b").as("d")).head().getDouble(0)
    assert(d == 1.0)
  }

  test("dot distance is negative dot product") {
    assert(math.abs(one(dotDistance($"a", $"b")) - (-12.0)) < 1e-12)
  }

  test("manhattan") {
    assert(math.abs(one(manhattan($"a", $"b")) - (3.0 + 7.0 + 3.0)) < 1e-12)
  }

  test("hamming counts differing positions") {
    val c = Array(1.0f, 9.0f, 3.0f)
    val d = Seq((a, c)).toDF("a", "b")
      .select(hamming($"a", $"b").as("d")).head().getDouble(0)
    assert(d == 1.0)
  }

  test("haversine: London-Paris ~343km") {
    val d = Seq((51.5074, -0.1278, 48.8566, 2.3522)).toDF("a", "b", "c", "d")
      .select(haversineMeters($"a", $"b", $"c", $"d").as("m")).head().getDouble(0)
    assert(d > 330000 && d < 350000)
  }

  test("maxsim: sum of per-query-token best dot products, negated") {
    val q = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val doc = Array(Array(0.5f, 0.5f), Array(0.0f, 2.0f))
    val d = Seq((q, doc)).toDF("q", "d")
      .select(maxSim($"q", $"d").as("s")).head().getDouble(0)
    // token1 best: max(0.5, 0) = 0.5 ; token2 best: max(0.5, 2.0) = 2.0
    assert(math.abs(d - (-2.5)) < 1e-12)
  }

  test("interpreted eval matches codegen (wholestage off)") {
    val df = Seq((a, b)).toDF("a", "b")
    val on = df.select(cosineDistance($"a", $"b")).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(cosineDistance($"a", $"b")).head().getDouble(0)
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
