package graft

import org.apache.spark.sql.functions._

import graft.ann.{IvfPq, ProductQuantizer}
import graft.model.Metric
import graft.operators.VectorSearch

/** IVF-PQ two-level index: residual accuracy, probe-relative recall,
 * partition-pruned + code-only plan shape. */
class IvfPqSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("residual ADC estimates are tighter than raw-vector ADC (the point of residual coding)", SlowTests) {
    val idx = IvfPq.build(emb, "vec_id", "embedding", nlist = 8, m = 8, k = 16)
    val rawPq = ProductQuantizer.train(emb, "embedding", m = 8, k = 16)
    val rawEncoded = emb.withColumn("code", rawPq.encode($"embedding"))
    val q = emb.filter($"vec_id" === 25L).head().getSeq[Float](1).toArray

    // exact distances for every row
    val exact = VectorSearch.withDistance(emb, "embedding", q, Metric.L2Squared)
      .select($"vec_id", col(VectorSearch.DistanceCol).as("d"))
    // raw ADC estimate error
    val rawErr = rawEncoded
      .withColumn("est", rawPq.adcDistance($"code", q))
      .join(exact, "vec_id")
      .agg(avg(abs($"est" - $"d"))).head().getDouble(0)
    // residual ADC estimate error over ALL partitions (full probe)
    val allProbes = idx.ivf.centroids.map(_._1).toSeq
    val resErr = idx.firstPass(q, allProbes, Int.MaxValue)
      .join(exact, "vec_id")
      .agg(avg(abs($"__adc" - $"d"))).head().getDouble(0)
    assert(resErr < rawErr, s"residual err $resErr !< raw err $rawErr")
  }

  test("low-nprobe recall vs the probed-exact ceiling >= 0.9 (PQ stage loses almost nothing)", SlowTests) {
    val idx = IvfPq.build(emb, "vec_id", "embedding", nlist = 8, m = 8, k = 16)
    val queries = emb.filter($"vec_id" % 50 === 0).select($"vec_id", $"embedding").collect()
    val recalls = queries.map { row =>
      val q = row.getSeq[Float](1).toArray
      val probes = idx.ivf.rankCentroids(q).take(2).toSeq
      // ceiling: exact search restricted to the SAME probed partitions — the
      // PQ first pass can at best match this; probe misses are the IVF
      // tradeoff already documented in AnnSpec
      val subset = idx.ivf.assigned.filter($"__centroid".isin(probes: _*))
      val ceiling = VectorSearch.withDistance(subset, "embedding", q, Metric.L2Squared)
        .orderBy(col(VectorSearch.DistanceCol).asc, $"vec_id".asc).limit(10)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      val got = idx.search(q, topK = 10, nprobe = 2, rescoreFactor = 8)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      ceiling.intersect(got).size.toDouble / ceiling.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean probe-relative recall $mean (${recalls.mkString(",")})")
  }

  test("persisted layout: probe = PartitionFilters, first pass never reads vectors, semi-join rescore", SlowTests) {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-plan").toString
    val idx = IvfPq.build(emb, "vec_id", "embedding", nlist = 8, m = 8, k = 16,
      persistPath = Some(path))
    val q = emb.filter($"vec_id" === 25L).head().getSeq[Float](1).toArray
    val probes = idx.ivf.rankCentroids(q).take(2).toSeq

    val p1 = idx.firstPass(q, probes, 40).queryExecution.executedPlan.toString
    assert(p1.contains("PartitionFilters") && p1.contains("__centroid"),
      s"probe is not partition pruning:\n$p1")
    assert(!p1.contains("embedding"), s"vector column not pruned from first pass:\n$p1")

    val res = idx.search(q, topK = 5, nprobe = 8, rescoreFactor = 8)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("Broadcast"),
      s"rescore candidate fetch is not a broadcast semi-join:\n$plan")
    // full probe + rescore → the query's own row comes back first, dist 0
    assert(res.select($"vec_id").collect().map(_.getLong(0)).head == 25L)
  }
}
