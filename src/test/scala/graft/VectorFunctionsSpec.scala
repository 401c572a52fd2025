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

  test("reference distancer fixture parity (distancer/*_test.go values)") {
    def d(expr: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column, v1: Array[Float], v2: Array[Float]): Double =
      Seq((v1, v2)).toDF("a", "b").select(expr($"a", $"b").as("d")).head().getDouble(0)
    // l2_test.go: {3,4,5} vs {1.5,2,2.5} -> 12.5; {10,11} vs {13,15} -> 25
    assert(math.abs(d(l2Squared, Array(3f, 4f, 5f), Array(1.5f, 2f, 2.5f)) - 12.5) < 1e-9)
    assert(math.abs(d(l2Squared, Array(10f, 11f), Array(13f, 15f)) - 25.0) < 1e-9)
    // manhattan_test.go: -> 6; -> 7
    assert(math.abs(d(manhattan, Array(3f, 4f, 5f), Array(1.5f, 2f, 2.5f)) - 6.0) < 1e-9)
    assert(math.abs(d(manhattan, Array(10f, 11f), Array(13f, 15f)) - 7.0) < 1e-9)
    // hamming_test.go: all-different -> 3; one-different -> 1
    assert(d(hamming, Array(3f, 4f, 5f), Array(1.5f, 2f, 2.5f)) == 3.0)
    assert(d(hamming, Array(10f, 11f), Array(10f, 15f)) == 1.0)
    // cosine_dist_test.go: normalized {0.1,0.3,0.7} vs {0.2,0.2,0.2} -> 0.173
    // (float32 assert in the reference; InDelta-equivalent tolerance here)
    def norm(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat)
    }
    assert(math.abs(d(cosineDistance,
      norm(Array(0.1f, 0.3f, 0.7f)), norm(Array(0.2f, 0.2f, 0.2f))) - 0.173) < 5e-4)
    // identical angle -> 0
    assert(math.abs(d(cosineDistance,
      norm(Array(0.1f, 0.3f, 0.7f)), norm(Array(0.2f, 0.6f, 1.4f)))) < 1e-6)
    // geo_spatial_test.go: Munich-Stuttgart ~190 km +- 1 km
    val geo = Seq(((48.137154, 11.576124), (48.783333, 9.183333)))
      .toDF("m", "s")
      .select(haversineMeters($"m._1", $"m._2", $"s._1", $"s._2").as("d"))
      .head().getDouble(0)
    assert(math.abs(geo - 190000.0) < 1000.0, s"geo=$geo")
  }

  test("dimension mismatch errors loudly (never reads out of bounds)") {
    val e = intercept[Throwable] {
      Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
        .select(l2Squared($"a", $"b")).collect()
    }
    // surfaces directly or wrapped, depending on the eval path
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("dimension mismatch"), msg)
  }

  test("NaN embedding assigns deterministically instead of crashing") {
    val cents = Array(Array(0.0, 0.0), Array(5.0, 5.0))
    val bad = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(Float.NaN, 1.0f))
    val got = org.apache.spark.sql.graft.NearestCentroids.compute(bad, cents, 2)
    assert(got.toSeq == Seq(0, 1)) // first-unused order, no AIOOBE
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

  test("two kernels in one codegen stage do not collide on locals") {
    // regression: literal `int i` in generated loops made any stage with two
    // distance expressions fail Janino compilation and silently fall back
    val df = Seq((a, b)).toDF("a", "b")
    val row = df.select(
      l2Squared($"a", $"b").as("d1"), cosineDistance($"a", $"b").as("d2"),
      dotDistance($"a", $"b").as("d3"), manhattan($"a", $"b").as("d4")).head()
    assert(math.abs(row.getDouble(0) - 67.0) < 1e-12)
    assert(math.abs(row.getDouble(2) - (-12.0)) < 1e-12)
    assert(math.abs(row.getDouble(3) - 13.0) < 1e-12)
  }

  test("maxsim codegen matches interpreted eval (wholestage off)") {
    val q = Array(Array(1.0f, 2.0f, -1.0f), Array(0.5f, -0.25f, 3.0f))
    val doc = Array(Array(0.5f, 0.5f, 1.0f), Array(0.0f, 2.0f, -2.0f), Array(1.5f, 0.0f, 0.0f))
    val df = Seq((q, doc)).toDF("q", "d")
    val on = df.select(maxSim($"q", $"d")).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(maxSim($"q", $"d")).head().getDouble(0)
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // empty doc bag contributes nothing instead of -inf
    val emptyDoc = Seq((q, Array.empty[Array[Float]])).toDF("q", "d")
      .select(maxSim($"q", $"d")).head().getDouble(0)
    assert(emptyDoc == 0.0)
  }

  test("nearestCentroids: top-r ascending, lower id wins ties, codegen parity") {
    val cents = Array(
      Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0)) // 3 ties 1
    val df = Seq(Tuple1(Array(0.9f, 0.1f))).toDF("v")
    def run(): Seq[Int] =
      df.select(nearestCentroids($"v", cents, 3).as("c")).head().getSeq[Int](0)
    val on = run()
    // nearest = centroid 1 (tie with 3 → lower id first), then 3, then 0
    assert(on == Seq(1, 3, 0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == on)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
