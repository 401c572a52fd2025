package graft

import org.apache.spark.sql.functions._

import graft.ann.RotationalQuantizer
import graft.model.Metric
import graft.operators.VectorSearch
import org.apache.spark.sql.graft.{FastRotationSpec, RqOps, VectorFunctions}

/** Rotational quantization: rotation orthogonality, code layout, distance
 * estimates, recall and plan shape — mirroring the reference's
 * rotational_quantization_test.go / fast_rotation_test.go coverage. */
class RqSpec extends SparkSpecBase {
  import spark.implicits._

  private def randVec(n: Int, seed: Int): Array[Float] = {
    val r = new java.util.Random(seed)
    Array.fill(n)(r.nextFloat() * 2 - 1)
  }

  test("fast rotation is orthogonal: preserves dots and norms, pads to 64-multiples") {
    val rot = FastRotationSpec(inputDim = 48, rounds = 3, seed = 7L)
    assert(rot.outputDim == 64)
    val x = randVec(48, 1); val y = randVec(48, 2)
    val (rx, ry) = (rot.rotate(x), rot.rotate(y))
    assert(rx.length == 64)
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (p, q) => p.toDouble * q }.sum
    assert(math.abs(dot(rx, ry) - dot(x, y)) < 1e-4, s"${dot(rx, ry)} vs ${dot(x, y)}")
    assert(math.abs(dot(rx, rx) - dot(x, x)) < 1e-4)
    // 200-dim pads to 256 and uses the 256-block FWHT path
    val rot2 = FastRotationSpec(inputDim = 200, rounds = 3, seed = 7L)
    assert(rot2.outputDim == 256)
    val big = randVec(200, 3)
    assert(math.abs(dot(rot2.rotate(big), rot2.rotate(big)) - dot(big, big)) < 1e-3)
  }

  test("code layout + zero vector; compressed distances approximate true distances") {
    val rot = FastRotationSpec(inputDim = 64, rounds = 3, seed = 7L)
    val x = randVec(64, 4); val y = randVec(64, 5)
    val cx = RqOps.encode(x, rot); val cy = RqOps.encode(y, rot)
    assert(cx.length == 64 + 16)
    // zero vector → all-zero code (reference ZeroRQCode)
    assert(RqOps.encode(Array.fill(64)(0f), rot).forall(_ == 0))

    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (p, q) => p.toDouble * q }.sum
    val l2True = x.zip(y).map { case (p, q) => (p.toDouble - q) * (p - q) }.sum
    assert(math.abs(RqOps.distance(cx, cy, 0) - l2True) < 0.05 * math.max(1.0, l2True),
      s"${RqOps.distance(cx, cy, 0)} vs $l2True")
    assert(math.abs(RqOps.distance(cx, cy, 1) - (-dot(x, y))) < 0.05,
      s"${RqOps.distance(cx, cy, 1)} vs ${-dot(x, y)}")
    assert(math.abs(RqOps.distance(cx, cy, 2) - (1.0 - dot(x, y))) < 0.05)
    // identical codes → l2 estimate within quantization error of 0
    assert(math.abs(RqOps.distance(cx, cx, 0)) < 0.01)
  }

  test("column encoder ≡ driver-side twin; codegen parity") {
    val rot = FastRotationSpec(inputDim = 64, rounds = 3, seed = 7L)
    val rq = RotationalQuantizer(rot)
    val x = randVec(64, 6); val y = randVec(64, 7)
    val want = RqOps.distance(RqOps.encode(x, rot), RqOps.encode(y, rot), 0)
    val df = Seq((x, y)).toDF("x", "y")
      .select(VectorFunctions.rqEncode($"x", rot).as("cx"),
        VectorFunctions.rqEncode($"y", rot).as("cy"))
    def run(): Double =
      df.select(VectorFunctions.rqCodeDistance($"cx", $"cy", Metric.L2Squared))
        .head().getDouble(0)
    assert(math.abs(run() - want) < 1e-9)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(math.abs(run() - want) < 1e-9)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // column code bytes equal the driver-side encode
    val colCode = df.select($"cx").head().getAs[Array[Byte]](0)
    assert(colCode.toSeq == RqOps.encode(x, rot).toSeq)
    assert(rq.encodeQuery(x).toSeq == colCode.toSeq)
  }

  test("RQ first pass + rescore: recall@10 >= 0.9 vs exact brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val rq = RotationalQuantizer(dim)
    val encoded = emb.withColumn("code", rq.encode($"embedding")).cache()
    encoded.count()
    val queries = emb.filter($"vec_id" % 50 === 0).select($"vec_id", $"embedding").collect()
    val recalls = queries.map { row =>
      val q = row.getSeq[Float](1).toArray
      val truth = VectorSearch.withDistance(emb, "embedding", q, Metric.L2Squared)
        .orderBy(col(VectorSearch.DistanceCol).asc, $"vec_id".asc).limit(10)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      val got = rq.search(encoded, "vec_id", "code", "embedding",
          q, topK = 10, rescoreFactor = 16)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall $mean (${recalls.mkString(",")})")
  }

  test("two-phase plan: first pass never reads the vector column; rescore is a broadcast semi-join") {
    val path = java.nio.file.Files.createTempDirectory("rq-plan").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val rq = RotationalQuantizer(dim)
    emb.withColumn("code", rq.encode($"embedding")).write.mode("overwrite").parquet(path)
    val encoded = spark.read.parquet(path)
    val q = emb.filter($"vec_id" === 25L).head().getSeq[Float](1).toArray

    val p1 = rq.firstPass(encoded, "vec_id", "code", q, 40, Metric.L2Squared)
      .queryExecution.executedPlan.toString
    assert(p1.contains("ReadSchema") && !p1.contains("embedding"),
      s"vector column not pruned from first pass:\n$p1")

    val res = rq.search(encoded, "vec_id", "code", "embedding", q, topK = 5)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("Broadcast"),
      s"rescore candidate fetch is not a broadcast semi-join:\n$plan")
    assert(res.select($"vec_id").collect().map(_.getLong(0)).head == 25L)
  }
}
