package graft

import org.apache.spark.sql.functions._

import graft.ann.ProductQuantizer
import graft.model.Metric
import graft.operators.{MergeGrouper, VectorSearch}

class GrouperAndPqSpec extends SparkSpecBase {
  import spark.implicits._

  private def pool = Seq(
    // two tight directions: (1,0)-ish and (0,1)-ish
    (1L, "a", 10.0, true, Array(1.0f, 0.01f)),
    (2L, "b", 20.0, true, Array(0.99f, 0.02f)),
    (3L, "c", 30.0, false, Array(0.01f, 1.0f)),
    (4L, "d", 40.0, false, Array(0.02f, 0.98f))
  ).toDF("id", "name", "price", "flag", "vec")

  test("group closest: one representative per cluster, best-ranked wins") {
    val out = MergeGrouper.group(pool, "vec", force = 0.1, MergeGrouper.Closest)
      .select($"id", $"group_size").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (3L, 2L)))
  }

  test("group merge: text concat, numbers averaged, bool majority") {
    val out = MergeGrouper.group(pool, "vec", force = 0.1, MergeGrouper.Merge)
      .select($"name", $"price", $"flag", $"group_size").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a (b)")
    assert(out(0).getDouble(1) == 15.0)
    assert(out(0).getBoolean(2))
    assert(out(1).getString(0) == "c (d)")
    assert(out(1).getDouble(1) == 35.0)
    assert(!out(1).getBoolean(2))
  }

  test("group merge excludes nulls (no NPE; all-null column merges to null)") {
    val p = Seq(
      (1L, "a", Some(10.0), Array(1.0f, 0.01f)),
      (2L, null.asInstanceOf[String], None, Array(0.99f, 0.02f)),
      (3L, "c", None, Array(0.01f, 1.0f)),
      (4L, "d", None, Array(0.02f, 0.98f))
    ).toDF("id", "name", "price", "vec")
    val out = MergeGrouper.group(p, "vec", force = 0.1, MergeGrouper.Merge)
      .select($"name", $"price", $"group_size").collect()
    assert(out.length == 2)
    // group {1,2}: null name dropped from the concat, null price dropped
    // from the average
    assert(out(0).getString(0) == "a")
    assert(out(0).getDouble(1) == 10.0)
    // group {3,4}: all prices null → null
    assert(out(1).getString(0) == "c (d)")
    assert(out(1).isNullAt(1))
  }

  test("an item within force of TWO groups joins the FIRST-CREATED group, " +
      "not the closest (grouper.go hasMatch iterates groups in creation order)") {
    // angles: A at 0°, B at 55°, C at 29°; force 0.07 ⇔ angle < 30.7°
    //   normDist(C,A) = (1−cos29°)/2 ≈ 0.0627  < 0.07 (matches group 0)
    //   normDist(C,B) = (1−cos26°)/2 ≈ 0.0506  < 0.07 (matches group 1 — CLOSER)
    //   normDist(A,B) = (1−cos55°)/2 ≈ 0.2132  > 0.07 (A, B stay separate)
    // The driver beds never produce a two-group match, so this is the one
    // gate on the conflict rule: join-the-closest, join-the-min-id, and
    // merge-both implementations all put C with B instead.
    def at(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val p = Seq((1L, "a", at(0.0)), (2L, "b", at(55.0)), (3L, "c", at(29.0)))
      .toDF("id", "name", "vec")
    val out = MergeGrouper.group(p, "vec", force = 0.07, MergeGrouper.Closest)
      .select($"id", $"group_size").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L)),
      s"C must join A's earlier group despite being closer to B (got ${out.toSeq})")
  }

  test("force=0 keeps every result its own group") {
    val n = MergeGrouper.group(pool, "vec", force = 0.0, MergeGrouper.Closest).count()
    assert(n == 4)
  }

  test("PQ ADC + rescore: recall@10 >= 0.9 vs exact brute force", SlowTests) {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pq = ProductQuantizer.train(emb, "embedding", m = 8, k = 16)
    val encoded = emb.withColumn("code", pq.encode($"embedding")).cache()
    encoded.count()
    val queries = emb.filter($"vec_id" % 50 === 0).select($"vec_id", $"embedding").collect()
    val recalls = queries.map { row =>
      val q = row.getSeq[Float](1).toArray
      val truth = VectorSearch.withDistance(emb, "embedding", q, Metric.L2Squared)
        .orderBy(col(VectorSearch.DistanceCol).asc, $"vec_id".asc).limit(10)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      val got = pq.search(encoded, "vec_id", "code", "embedding", q, topK = 10, rescoreFactor = 16)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall $mean (${recalls.mkString(",")})")
  }

  test("PQ compression: codes are m small ints") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pq = ProductQuantizer.train(emb, "embedding", m = 8, k = 16)
    val codes = emb.limit(10).select(pq.encode($"embedding").as("c")).head().getSeq[Int](0)
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
  }
}
