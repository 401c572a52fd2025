package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Cluster, Dedup}

/** Cluster.lloyd vs a straight-line driver-side Lloyd replay: assignments,
 * distances, final centroids, the empty-cluster keep rule, and the
 * iters=0 ≡ seedAssign degeneration. */
class ClusterSpec extends SparkSpecBase {
  import spark.implicits._

  private def l2(a: Array[Float], c: Array[Double]): Double =
    a.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum

  private def replay(points: Seq[(Long, Array[Float])], k: Int, iters: Int)
      : (Seq[(Long, Int, Double)], Seq[Array[Double]]) = {
    var cs: Seq[Array[Double]] =
      points.sortBy(_._1).take(k).map(_._2.map(_.toDouble))
    def near(v: Array[Float]): Int =
      cs.zipWithIndex.minBy { case (c, i) => (l2(v, c), i) }._2
    for (_ <- 1 to iters) {
      val byC = points.groupBy(p => near(p._2))
      cs = cs.zipWithIndex.map { case (prev, i) =>
        byC.get(i).map { ms =>
          prev.indices.map(j => ms.map(_._2(j).toDouble).sum / ms.size).toArray
        }.getOrElse(prev)
      }
    }
    (points.map { case (id, v) =>
      val c = near(v); (id, c, l2(v, cs(c)))
    }, cs)
  }

  private def run(points: Seq[(Long, Array[Float])], k: Int, iters: Int) = {
    val df = points.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    Cluster.lloyd(df, col("id"), col("v"), k, iters)
  }

  // two well-separated blobs; the two smallest-id seeds both start in blob A,
  // so the iterations have to actually move a centroid across to blob B
  private val blobs: Seq[(Long, Array[Float])] =
    Seq(0L -> Array(0f, 0f), 1L -> Array(1f, 0f), 2L -> Array(0f, 1f),
      3L -> Array(1f, 1f), 4L -> Array(20f, 20f), 5L -> Array(21f, 20f),
      6L -> Array(20f, 21f), 7L -> Array(21f, 21f))

  test("matches the straight-line Lloyd replay after 3 iterations") {
    val (gotDf, gotCs) = run(blobs, k = 2, iters = 3)
    val (expA, expCs) = replay(blobs, k = 2, iters = 3)
    val got = gotDf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      expA.sortBy(_._1).map(t => (t._1, t._2)))
    got.zip(expA.sortBy(_._1)).foreach { case ((_, _, d), (_, _, ed)) =>
      assert(math.abs(d - ed) < 1e-9) }
    gotCs.zip(expCs).foreach { case (c, ec) =>
      c.zip(ec).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) } }
    // the blobs must actually separate
    assert(got.filter(_._1 < 4).map(_._2).distinct.length == 1)
    assert(got.filter(_._1 >= 4).map(_._2).distinct.length == 1)
    assert(got.filter(_._1 < 4).head._2 != got.filter(_._1 >= 4).head._2)
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // seed0 = (0,0), seed1 = (0.1, 0); every point is nearer seed1 after the
    // first update pulls it to the blob mean — cluster 0 must keep (0,0)
    val pts: Seq[(Long, Array[Float])] =
      Seq(0L -> Array(0f, 0f), 1L -> Array(0.1f, 0f),
        2L -> Array(5f, 5f), 3L -> Array(5f, 6f), 4L -> Array(6f, 5f))
    val (gotDf, gotCs) = run(pts, k = 2, iters = 2)
    val (expA, expCs) = replay(pts, k = 2, iters = 2)
    assert(gotCs(0).toSeq == expCs(0).toSeq)
    val got = gotDf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      expA.sortBy(_._1).map(t => (t._1, t._2)))
  }

  test("iters = 0 degenerates to seedAssign's nearest-seed clustering") {
    val df = blobs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    val (gotDf, _) = Cluster.lloyd(df, col("id"), col("v"), k = 2, iters = 0)
    val seed = Dedup.seedAssign(df, col("id"), col("v"), k = 2)
      .select(col("__id"), col("__cluster")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    gotDf.collect().foreach(r => assert(r.getInt(1) == seed(r.getLong(0))))
  }

  test("plan: broadcast equi-join only, no cartesian") {
    val (gotDf, _) = run(blobs, k = 2, iters = 1)
    val plan = gotDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
