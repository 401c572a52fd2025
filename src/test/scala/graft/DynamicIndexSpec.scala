package graft

import org.apache.spark.sql.functions._

import graft.ann.DynamicIndex
import graft.model.Metric
import graft.operators.VectorSearch

/** Dynamic index semantics (reference: adapters/repos/db/vector/dynamic/
 * index.go; entities/vectorindex/dynamic/config.go DefaultThreshold):
 * flat below the threshold, threshold-crossing append triggers the
 * flat→IVF rebuild, post-upgrade appends ride the assign-only path. */
class DynamicIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select($"vec_id", $"embedding")

  private def exactTopK(df: org.apache.spark.sql.DataFrame, q: Array[Float], k: Int) =
    VectorSearch.withDistance(df, "embedding", q, Metric.L2Squared)
      .orderBy(col(VectorSearch.DistanceCol).asc, $"vec_id".asc).limit(k)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq

  test("flat regime: exact brute-force results, reports shouldUpgrade") {
    val small = emb.filter($"vec_id" < 40)
    val dyn = DynamicIndex.build(small, "vec_id", "embedding",
      threshold = 100L, nlist = 4)
    assert(!dyn.upgraded)
    assert(dyn.shouldUpgrade == (true, 100L))
    val q = emb.filter($"vec_id" === 7L).head().getSeq[Float](1).toArray
    val got = dyn.search(q, 5, Metric.L2Squared).select($"vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == exactTopK(small, q, 5))
  }

  test("sub-threshold append stays flat; crossing append upgrades to IVF") {
    val dyn0 = DynamicIndex.build(emb.filter($"vec_id" < 40), "vec_id", "embedding",
      threshold = 100L, nlist = 4, defaultNprobe = 4)
    val dyn1 = dyn0.append(emb.filter($"vec_id" >= 40 && $"vec_id" < 60))
    assert(!dyn1.upgraded && dyn1.count == 60)
    val dyn2 = dyn1.append(emb.filter($"vec_id" >= 60 && $"vec_id" < 200))
    assert(dyn2.upgraded && dyn2.count == 200)
    // full probe (nprobe = nlist) over the upgraded index is exact
    val q = emb.filter($"vec_id" === 3L).head().getSeq[Float](1).toArray
    val got = dyn2.search(q, 8, Metric.L2Squared, nprobe = Some(4))
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == exactTopK(emb.filter($"vec_id" < 200), q, 8))
  }

  test("build at/above threshold comes up upgraded; persisted probe is partition-pruned") {
    val path = java.nio.file.Files.createTempDirectory("dyn-spec").toString
    val dyn = DynamicIndex.build(emb.limit(300), "vec_id", "embedding",
      threshold = 100L, nlist = 4, defaultNprobe = 1, persistPath = Some(path))
    assert(dyn.upgraded && dyn.shouldUpgrade._1 == false)
    val q = emb.filter($"vec_id" === 11L).head().getSeq[Float](1).toArray
    val probed = dyn.search(q, 5, Metric.L2Squared) // nprobe=1 of nlist=4
    val plan = probed.queryExecution.executedPlan.toString
    // single-probe plans render as [isnotnull(__centroid), (__centroid = N)]
    assert("PartitionFilters: \\[[^\\]]*__centroid".r.findFirstIn(plan).isDefined,
      s"probe not partition-pruned:\n$plan")
  }

  test("post-upgrade append rides the assign-only incremental path (no retrain)") {
    val dyn = DynamicIndex.build(emb.filter($"vec_id" < 150), "vec_id", "embedding",
      threshold = 100L, nlist = 4, defaultNprobe = 4)
    assert(dyn.upgraded)
    val before = dyn.ivf.get.centroids.map(_._2.toSeq).toSeq
    // plant an exact copy of vec 5 under a fresh id
    val dup = emb.filter($"vec_id" === 5L).select(lit(999999L).as("vec_id"), $"embedding")
    val dyn2 = dyn.append(dup)
    assert(dyn2.ivf.get.centroids.map(_._2.toSeq).toSeq == before,
      "append must not retrain centroids")
    val q = emb.filter($"vec_id" === 5L).head().getSeq[Float](1).toArray
    val top2 = dyn2.search(q, 2, Metric.L2Squared).select($"vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(5L, 999999L), s"planted copy must be probe-visible, got $top2")
  }
}
