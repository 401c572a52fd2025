package graft

import org.apache.spark.sql.functions._

import graft.ann.IvfIndex
import graft.model.Metric
import graft.operators.KnnJoin

/**
 * IVF-bucketed kNN join vs the brute-force cross join (reference analogue:
 * classification kNN, usecases/classification/classifier.go:229-300).
 *  - full probe must reproduce brute force exactly (same argument as AnnSpec's
 *    "nprobe = nlist reproduces brute force");
 *  - pruned probe must hit the same recall bar as the IVF search path (≥ 0.9,
 *    mirroring hnsw/compress_recall_test.go:144);
 *  - and the physical plan must be an equi-join, not a nested-loop product —
 *    that is the whole point of the operator.
 */
class KnnJoinSpec extends SparkSpecBase {
  import spark.implicits._

  /** 20 tight clusters in 16-d — the workload IVF bucketing is built for. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(20)(Array.fill(16)(rnd.nextGaussian()))
    (0 until 2000).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val index = {
    val ix = IvfIndex.build(clustered, "vec_id", "embedding", nlist = 16)
    ix.assigned.cache().count()
    ix
  }

  private def probes = clustered.filter($"vec_id" % 100 === 0)

  test("full probe (nprobe = nlist) equals the brute-force join exactly") {
    val brute = KnnJoin(clustered, $"vec_id", $"embedding",
        probes, $"vec_id", $"embedding", k = 5, Metric.L2Squared)
      .select($"probe_id", $"rank", $"data_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bucketed = KnnJoin.bucketed(index, probes, $"vec_id", $"embedding",
        k = 5, Metric.L2Squared, nprobe = 16)
      .select($"probe_id", $"rank", $"data_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(bucketed == brute)
  }

  test("pruned probe (nprobe = 4/16) recall >= 0.9 vs brute force") {
    val brute = KnnJoin(clustered, $"vec_id", $"embedding",
        probes, $"vec_id", $"embedding", k = 5, Metric.L2Squared)
      .select($"probe_id", $"data_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = KnnJoin.bucketed(index, probes, $"vec_id", $"embedding",
        k = 5, Metric.L2Squared, nprobe = 4)
      .select($"probe_id", $"data_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(bucketed).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("bucketed plan is an equi-join on centroid, not a nested-loop product") {
    val plan = KnnJoin.bucketed(index, probes, $"vec_id", $"embedding",
      k = 5, Metric.L2Squared, nprobe = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"bucketed join compiled to a product:\n$plan")
    // and the brute-force path IS the product (sanity check of the assert)
    val brutePlan = KnnJoin(clustered, $"vec_id", $"embedding",
      probes, $"vec_id", $"embedding", k = 5, Metric.L2Squared)
      .queryExecution.executedPlan.toString
    assert(brutePlan.contains("NestedLoop") || brutePlan.contains("Cartesian"))
  }

  test("pipeline-scale self-join takes the salted shuffle path, exact at full probe") {
    // probes == data (corpus self-join semantic dedup): the probe relation
    // must NOT be broadcast — the salted shuffle hash join is the only shape
    // that survives 100 TB on both sides
    val self = KnnJoin.bucketed(index, clustered, $"vec_id", $"embedding",
      k = 3, Metric.L2Squared, nprobe = 16, broadcastProbes = Some(false))
    // assert on the pre-AQE physical plan (AQE may legally re-broadcast at
    // this toy scale; the declared shape is what matters for the contract)
    val plan = self.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"probe relation broadcast on the shuffle path:\n$plan")
    assert(plan.contains("__salt") || plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a salted shuffle join:\n$plan")
    val brute = KnnJoin(clustered, $"vec_id", $"embedding",
        clustered, $"vec_id", $"embedding", k = 3, Metric.L2Squared)
      .select($"probe_id", $"rank", $"data_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = self.select($"probe_id", $"rank", $"data_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == brute)
  }

  test("auto strategy broadcasts small probe sets, shuffles huge ones") {
    // small probe frame → stats estimate under the budget → broadcast
    val small = KnnJoin.bucketed(index, probes, $"vec_id", $"embedding",
      k = 3, Metric.L2Squared, nprobe = 4)
    assert(small.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
  }

  test("maxDistance range cut applies before ranking") {
    val all = KnnJoin.bucketed(index, probes, $"vec_id", $"embedding",
      k = 5, Metric.L2Squared, nprobe = 16)
    val maxD = all.agg(max($"dist")).head().getDouble(0)
    val cut = KnnJoin.bucketed(index, probes, $"vec_id", $"embedding",
      k = 5, Metric.L2Squared, nprobe = 16, maxDistance = Some(maxD / 2))
    assert(cut.agg(max($"dist")).head().getDouble(0) <= maxD / 2)
    assert(cut.count() < all.count())
  }
}
