package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ann.IvfIndex
import graft.model.Metric
import graft.streaming.IndexMaintenance

/** Assign-only incremental IVF updates + the streaming maintenance job
 * (reference: adapters/repos/db/vector_index_queue.go). */
class IndexMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def clustered(n: Int, offset: Long, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(8)(Array.fill(8)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % 8)
      (offset + i, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
  }

  test("append: new rows land in probed posting lists, centroids unchanged") {
    val path = Files.createTempDirectory("ivf-append").toString
    val base = clustered(800, 0L, 7).toDF("vec_id", "embedding")
    val ix0 = IvfIndex.build(base, "vec_id", "embedding", nlist = 8,
      defaultNprobe = 8, persistPath = Some(path))
    val before = ix0.assigned.count()

    // plant an appended row identical to an existing vector: it must become
    // the query's co-top-1 (distance 0) after append, proving probe visibility
    val anchor = base.filter($"vec_id" === 5L).head().getSeq[Float](1)
    val newRows = clustered(100, 10000L, 8).toDF("vec_id", "embedding")
      .unionByName(Seq((99999L, anchor)).toDF("vec_id", "embedding"))
    val ix1 = ix0.append(newRows)

    assert(ix1.centroids.map(_._1).toSeq == ix0.centroids.map(_._1).toSeq)
    assert(ix1.assigned.count() == before + 101)
    val top = ix1.search(anchor.toArray, 2, Metric.L2Squared, nprobe = 1)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(top == Set(5L, 99999L), s"appended twin not probe-visible: $top")

    // the appended layout must still partition-prune on probe
    val plan = ix1.search(anchor.toArray, 2, Metric.L2Squared, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [__centroid"), s"no pruning in:\n$plan")
  }

  test("unpersisted append keeps search exact at full probe") {
    val base = clustered(400, 0L, 9).toDF("vec_id", "embedding")
    val ix0 = IvfIndex.build(base, "vec_id", "embedding", nlist = 4, defaultNprobe = 4)
    val q = base.filter($"vec_id" === 11L).head().getSeq[Float](1).toArray
    val ix1 = ix0.append(Seq((50000L, q.toSeq)).toDF("vec_id", "embedding"))
    val top = ix1.search(q, 2, Metric.L2Squared, nprobe = 4)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(top == Set(11L, 50000L))
  }

  test("streaming maintenance drains file drops into the index layout") {
    val path = Files.createTempDirectory("ivf-stream").toString
    val inDir = Files.createTempDirectory("ivf-in").toString
    val ckpt = Files.createTempDirectory("ivf-ckpt").toString

    val base = clustered(800, 0L, 11).toDF("vec_id", "embedding")
    val index = IvfIndex.build(base, "vec_id", "embedding", nlist = 8,
      defaultNprobe = 8, persistPath = Some(path))
    val before = index.assigned.count()

    val anchor = base.filter($"vec_id" === 3L).head().getSeq[Float](1)
    Seq((77777L, anchor)).toDF("vec_id", "embedding")
      .write.mode("append").parquet(inDir)

    val stream = spark.readStream
      .schema(base.schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(inDir)
    val q = IndexMaintenance.start(stream, index, ckpt)
    q.awaitTermination(60000)

    val fresh = index.reload(spark)
    assert(fresh.assigned.count() == before + 1)
    val top = fresh.search(anchor.toArray, 2, Metric.L2Squared, nprobe = 1)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(top == Set(3L, 77777L), s"streamed row not probe-visible: $top")

    // a LATER stream with a fresh checkpoint numbers its batches from 0
    // again — the replay guard is per-query, so its first batch must land
    // instead of being dropped against the previous stream's high-water mark
    val inDir2 = Files.createTempDirectory("ivf-in2").toString
    val ckpt2 = Files.createTempDirectory("ivf-ckpt2").toString
    Seq((88888L, anchor)).toDF("vec_id", "embedding")
      .write.mode("append").parquet(inDir2)
    val q2 = IndexMaintenance.start(
      spark.readStream.schema(base.schema).parquet(inDir2), fresh, ckpt2)
    q2.awaitTermination(60000)
    assert(fresh.reload(spark).assigned.count() == before + 2,
      "fresh-checkpoint stream's batch 0 was dropped by the replay guard")
  }

  test("streaming postings maintenance: store upsert + delta'd index serve new docs") {
    import graft.engine.Graft
    import graft.model._
    import graft.operators.Bm25Search
    import graft.sources.CollectionStore

    val storeDir = Files.createTempDirectory("post-store").toString
    val inDir    = Files.createTempDirectory("post-in").toString
    val ckpt     = Files.createTempDirectory("post-ckpt").toString

    val schema = CollectionSchema("D", "id", Seq(
      Property("body", PropType.Text, Tokenization.Word)))
    val st = new CollectionStore(spark, storeDir, schema)
    st.init(Seq(
      (1L, "spark window join"), (2L, "table scan merge"),
      (3L, "stream batch filter"), (4L, "row column order")).toDF("id", "body"))

    val g = new Graft(spark).withPostingsPruneCutoff(0) // exercise the pruned arm
    g.register(st.collection)
    g.registerPostings("D", Seq("body"), buckets = 4)
    def hits(): Seq[Long] = g.get(GetParams("D",
      bm25 = Some(Bm25("zebra quill", properties = Seq("body"))),
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"))).collect().map(_.getLong(0)).toSeq
    // force the build; the probe terms match nothing yet
    assert(hits().isEmpty)
    val pre = g.get(GetParams("D",
      bm25 = Some(Bm25("spark join", properties = Seq("body"))),
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"))).count()
    assert(pre > 0)

    // drop two new docs (one replaces id 2) and drain the maintenance job
    Seq((5L, "zebra quill fox"), (2L, "zebra merge"))
      .toDF("id", "body").write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(st.read().schema).parquet(inDir)
    val q = IndexMaintenance.startPostings(stream, st, g, "D", ckpt)
    q.awaitTermination(60000)

    // the engine serves the NEW docs from the delta'd index (no rebuild) and
    // scores match a fresh scan over the post-mutation corpus exactly
    val got = g.get(GetParams("D",
      bm25 = Some(Bm25("zebra quill", properties = Seq("body"))),
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"), additional = Set("score")))
    assert(!got.queryExecution.executedPlan.toString.contains("__tok_"),
      "post-delta keyword query fell back to the scan path")
    val gotRows = got.select($"id", org.apache.spark.sql.functions.round($"_score", 9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val scan = Bm25Search.search(g.collection("D"), Bm25("zebra quill", Seq("body")), 10)
      .select($"id", org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.col(Bm25Search.ScoreCol), 9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotRows == scan)
    assert(gotRows.map(_._1).toSet == Set(5L, 2L), s"unexpected hits: $gotRows")
  }
}
