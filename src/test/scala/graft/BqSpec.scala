package graft

import org.apache.spark.sql.functions._

import graft.ann.BinaryQuantizer
import graft.model.Metric
import graft.operators.VectorSearch
import org.apache.spark.sql.graft.{SignPack, VectorFunctions}

class BqSpec extends SparkSpecBase {
  import spark.implicits._

  test("sign pack: reference bit layout (bit set when component < 0), codegen parity") {
    // 65 dims forces a second long; dim 0 negative -> bit 0, dim 64 negative -> second long bit 0
    val v = Array.fill(65)(1.0f)
    v(0) = -1f; v(3) = -0.5f; v(64) = -2f
    val df = Seq(Tuple1(v)).toDF("v")
    def run(): Seq[Long] =
      df.select(VectorFunctions.signPack($"v").as("c")).head().getSeq[Long](0)
    val on = run()
    assert(on == Seq((1L << 0) | (1L << 3), 1L))
    assert(SignPack.pack(v).toSeq == on) // driver-side twin agrees
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == on)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("bit hamming: popcount of xor, codegen parity") {
    val df = Seq((Array(0xF0L, 1L), Array(0x0FL, 1L))).toDF("a", "b")
    def run(): Long =
      df.select(VectorFunctions.bitHamming($"a", $"b")).head().getLong(0)
    val on = run()
    assert(on == 8L)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == on)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("BQ hamming + rescore: recall@10 >= 0.9 vs exact brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val encoded = emb.withColumn("code", BinaryQuantizer.encode($"embedding")).cache()
    encoded.count()
    val queries = emb.filter($"vec_id" % 50 === 0).select($"vec_id", $"embedding").collect()
    val recalls = queries.map { row =>
      val q = row.getSeq[Float](1).toArray
      val truth = VectorSearch.withDistance(emb, "embedding", q, Metric.L2Squared)
        .orderBy(col(VectorSearch.DistanceCol).asc, $"vec_id".asc).limit(10)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      val got = BinaryQuantizer.search(encoded, "vec_id", "code", "embedding",
          q, topK = 10, rescoreFactor = 16)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall $mean (${recalls.mkString(",")})")
  }

  test("two-phase plan: first pass never reads the vector column; rescore is a broadcast semi-join") {
    val path = java.nio.file.Files.createTempDirectory("bq-plan").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.withColumn("code", BinaryQuantizer.encode($"embedding"))
      .write.mode("overwrite").parquet(path)
    val encoded = spark.read.parquet(path)
    val q = emb.filter($"vec_id" === 25L).head().getSeq[Float](1).toArray

    // phase 1: the scan's ReadSchema must exclude the 32×-bigger vector column
    val p1 = BinaryQuantizer.firstPass(encoded, "vec_id", "code",
      BinaryQuantizer.encodeQuery(q), 40).queryExecution.executedPlan.toString
    assert(p1.contains("ReadSchema") && !p1.contains("embedding"),
      s"vector column not pruned from first pass:\n$p1")

    // full search: correct results, and the candidate set reaches the rescore
    // as a broadcast LEFT SEMI join — fully distributed, no driver collect
    // round-trip (round-9 watch item)
    val res = BinaryQuantizer.search(encoded, "vec_id", "code", "embedding", q, topK = 5)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("Broadcast"),
      s"rescore candidate fetch is not a broadcast semi-join:\n$plan")
    assert(res.select($"vec_id").collect().map(_.getLong(0)).head == 25L) // self first, dist 0
  }

  test("BQ code column is ceil(d/64) longs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val code = emb.limit(1).select(BinaryQuantizer.encode($"embedding").as("c"))
      .head().getSeq[Long](0)
    assert(code.length == 1) // 64-dim embeddings -> one long, 32x compression
  }
}
