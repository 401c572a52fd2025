package graft

import org.apache.spark.sql.functions._

import graft.ann.ScalarQuantizer
import graft.model.Metric
import graft.operators.VectorSearch
import org.apache.spark.sql.graft.{SqOps, VectorFunctions}

/** Scalar quantization parity + recall, mirroring the reference's
 * compressionhelpers/scalar_quantization_test.go and the recall bar of
 * compress_recall_test.go:144 (same ≥0.9 bar as IVF/PQ/BQ). */
class SqSpec extends SparkSpecBase {
  import spark.implicits._

  test("code layout: clamp-floor buckets + big-endian sum tails (reference codeFor)") {
    // a=2, b=-1 → range [-1, 1]; x=-1→0, x=1→255 (clamped), x=0→floor(0.5·255)=127
    val code = SqOps.encode(Array(-1f, 0f, 1f, -5f, 5f), a = 2f, b = -1f)
    assert(code.length == 5 + 8)
    assert((code(0) & 0xff) == 0 && (code(1) & 0xff) == 127 && (code(2) & 0xff) == 255)
    assert((code(3) & 0xff) == 0 && (code(4) & 0xff) == 255) // out-of-range clamps
    val sum = 0 + 127 + 255 + 0 + 255
    val got = ((code(5) & 0xffL) << 24) | ((code(6) & 0xffL) << 16) |
      ((code(7) & 0xffL) << 8) | (code(8) & 0xffL)
    assert(got == sum)
  }

  test("compressed-domain distances match the reference formulas; codegen parity") {
    val x = Array(0.25f, -0.5f, 0.75f, -0.125f)
    val y = Array(-0.75f, 0.5f, 0.125f, 0.625f)
    val (a, b) = (1.5f, -0.75f)
    val cx = SqOps.encode(x, a, b); val cy = SqOps.encode(y, a, b)

    // reference scalar_quantization.go:39-53, recomputed independently here
    def codes(c: Array[Byte]) = c.dropRight(8).map(_ & 0xff)
    val (kx, ky) = (codes(cx), codes(cy))
    val a2 = a.toDouble * a / (255.0 * 255.0)
    val ab = a.toDouble * b / 255.0
    val ib2 = b.toDouble * b * x.length
    val l2Want = a2 * kx.zip(ky).map { case (p, q) => (p - q).toDouble * (p - q) }.sum
    val dotSim = a2 * kx.zip(ky).map { case (p, q) => p.toDouble * q }.sum +
      ab * (kx.sum + ky.sum) + ib2

    assert(math.abs(SqOps.distance(cx, cy, a, b, 0) - l2Want) < 1e-9)
    assert(math.abs(SqOps.distance(cx, cy, a, b, 1) - (-dotSim)) < 1e-9)
    assert(math.abs(SqOps.distance(cx, cy, a, b, 2) - (1.0 - dotSim)) < 1e-9)

    // the compressed dot approximates the true dot (coarse 255-bucket bound)
    val trueDot = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    assert(math.abs(dotSim - trueDot) < 0.05, s"$dotSim vs $trueDot")

    // column expression ≡ driver-side twin, with and without codegen
    val df = Seq((x, y)).toDF("x", "y")
      .select(VectorFunctions.sqEncode($"x", a, b).as("cx"),
        VectorFunctions.sqEncode($"y", a, b).as("cy"))
    def run(m: Metric): Double =
      df.select(VectorFunctions.sqCodeDistance($"cx", $"cy", a, b, m)).head().getDouble(0)
    for (codegen <- Seq(true, false)) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try {
        assert(math.abs(run(Metric.L2Squared) - l2Want) < 1e-9)
        assert(math.abs(run(Metric.Dot) - (-dotSim)) < 1e-9)
        assert(math.abs(run(Metric.Cosine) - (1.0 - dotSim)) < 1e-9)
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("train: global min/max over every dimension value (reference NewScalarQuantizer)") {
    val df = Seq(Tuple1(Array(0.5f, -2.0f)), Tuple1(Array(3.0f, 1.0f))).toDF("v")
    val sq = ScalarQuantizer.train(df, "v")
    assert(sq.b == -2.0f && sq.a == 5.0f && sq.dim == 2)
  }

  test("SQ first pass + rescore: recall@10 >= 0.9 vs exact brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sq = ScalarQuantizer.train(emb, "embedding")
    val encoded = emb.withColumn("code", sq.encode($"embedding")).cache()
    encoded.count()
    val queries = emb.filter($"vec_id" % 50 === 0).select($"vec_id", $"embedding").collect()
    val recalls = queries.map { row =>
      val q = row.getSeq[Float](1).toArray
      val truth = VectorSearch.withDistance(emb, "embedding", q, Metric.L2Squared)
        .orderBy(col(VectorSearch.DistanceCol).asc, $"vec_id".asc).limit(10)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      val got = sq.search(encoded, "vec_id", "code", "embedding",
          q, topK = 10, rescoreFactor = 16)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall $mean (${recalls.mkString(",")})")
  }

  test("two-phase plan: first pass never reads the vector column; rescore is a broadcast semi-join") {
    val path = java.nio.file.Files.createTempDirectory("sq-plan").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sq = ScalarQuantizer.train(emb, "embedding")
    emb.withColumn("code", sq.encode($"embedding")).write.mode("overwrite").parquet(path)
    val encoded = spark.read.parquet(path)
    val q = emb.filter($"vec_id" === 25L).head().getSeq[Float](1).toArray

    val p1 = sq.firstPass(encoded, "vec_id", "code", q, 40, Metric.L2Squared)
      .queryExecution.executedPlan.toString
    assert(p1.contains("ReadSchema") && !p1.contains("embedding"),
      s"vector column not pruned from first pass:\n$p1")

    val res = sq.search(encoded, "vec_id", "code", "embedding", q, topK = 5)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("Broadcast"),
      s"rescore candidate fetch is not a broadcast semi-join:\n$plan")
    assert(res.select($"vec_id").collect().map(_.getLong(0)).head == 25L) // self first, dist 0
  }
}
