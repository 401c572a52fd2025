package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.engine.Graft
import graft.model.{CollectionSchema, GetParams, Pagination, Property, PropType, Where}
import graft.pipeline.Classify
import graft.sources.CollectionStore

/**
 * The full kNN classification RUN over a store — write-back, per-ref meta,
 * object meta, per-item failures and the run report (reference:
 * usecases/classification/classifier_run.go, classifier_run_knn.go,
 * ref_meta.go, adapters/repos/db/classification.go).
 */
class ClassificationJobSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = CollectionSchema("Cls", "id", Seq(
    Property("label_ref", PropType.Ref, refTarget = Some("Target"))))

  private def mkStore(rows: Seq[(Long, Array[Float], Option[Seq[Long]])]): CollectionStore = {
    val df = rows.toDF("id", "v", "label_ref")
    val st = new CollectionStore(spark,
      java.nio.file.Files.createTempDirectory("graft-clsjob").toString, schema)
    st.init(df)
    st
  }

  private val ts = 1700000000000000L // fixed completedAt micros

  test("winner, per-ref distance meta and object meta match hand computation") {
    // cosine to the (1,0) probe: id1 → nd 0, id2 → 0.1, id5 → 0.2 (top-3);
    // id3 → 0.5, id4 → 1 stay out. votes: target 10 × 2, target 20 × 1.
    val st = mkStore(Seq(
      (1L, Array(1f, 0f), Some(Seq(10L))),
      (2L, Array(0.8f, 0.6f), Some(Seq(10L))),
      (3L, Array(0f, 1f), Some(Seq(20L))),
      (4L, Array(-1f, 0f), Some(Seq(20L))),
      (5L, Array(0.6f, 0.8f), Some(Seq(20L))),
      (100L, Array(1f, 0f), None)))
    val run = Classify.knnJob(st, "v", "label_ref", k = 3, "run-1", ts)
    assert(run == graft.pipeline.ClassificationRun("run-1", "completed", None, 1L, 1L, 0L))

    val got = st.read().filter($"id" === 100L).collect().head
    assert(got.getAs[collection.Seq[Long]]("label_ref") == Seq(10L))
    val m = got.getAs[Row](Classify.refMetaCol("label_ref"))
    assert(m.getAs[Long]("overallCount") == 3L)
    assert(m.getAs[Long]("winningCount") == 2L)
    assert(m.getAs[Long]("losingCount") == 1L)
    assert(math.abs(m.getAs[Double]("closestOverallDistance")) < 1e-6)
    assert(math.abs(m.getAs[Double]("closestWinningDistance")) < 1e-6)
    assert(math.abs(m.getAs[Double]("meanWinningDistance") - 0.05) < 1e-6)
    assert(math.abs(m.getAs[Double]("closestLosingDistance") - 0.2) < 1e-6)
    assert(math.abs(m.getAs[Double]("meanLosingDistance") - 0.2) < 1e-6)
    val c = got.getAs[Row](Classify.MetaCol)
    assert(c.getAs[String]("id") == "run-1")
    assert(c.getAs[collection.Seq[String]]("scope") == Seq("label_ref"))
    assert(c.getAs[collection.Seq[String]]("classifiedFields") == Seq("label_ref"))
    assert(c.getAs[java.sql.Timestamp]("completed").getTime == ts / 1000)
    // training rows keep their refs and carry no run meta
    val t1 = st.read().filter($"id" === 1L).collect().head
    assert(t1.getAs[collection.Seq[Long]]("label_ref") == Seq(10L))
    assert(t1.getAs[Row](Classify.MetaCol) == null)
  }

  test("a multi-label training neighbour fails the item, which is not written") {
    // id6 sits at distance 0 from the probe, so it is always in the top-3;
    // its two labels violate extractBeacons' exactly-one-label rule
    val st = mkStore(Seq(
      (1L, Array(1f, 0f), Some(Seq(10L))),
      (2L, Array(0.8f, 0.6f), Some(Seq(10L))),
      (6L, Array(1f, 0f), Some(Seq(10L, 20L))),
      (100L, Array(1f, 0f), None),
      (101L, Array(-1f, 0f), None))) // far probe: top-3 = all three, also bad
    val run = Classify.knnJob(st, "v", "label_ref", k = 3, "run-2", ts)
    assert(run.status == "completed")
    assert(run.count == 2L && run.countSucceeded == 0L && run.countFailed == 2L)
    val back = st.read().filter($"id" >= 100L).collect()
    assert(back.forall(_.getAs[collection.Seq[Long]]("label_ref") == null))
    assert(back.forall(_.getAs[Row](Classify.MetaCol) == null))
  }

  test("vote ties pin to the smallest target id") {
    val st = mkStore(Seq(
      (1L, Array(1f, 0f), Some(Seq(20L))),
      (2L, Array(1f, 0f), Some(Seq(10L))),
      (100L, Array(1f, 0f), None)))
    Classify.knnJob(st, "v", "label_ref", k = 2, "run-3", ts)
    val got = st.read().filter($"id" === 100L).collect().head
    assert(got.getAs[collection.Seq[Long]]("label_ref") == Seq(10L))
  }

  test("no unclassified rows fails the run with the reference's error text") {
    val st = mkStore(Seq(
      (1L, Array(1f, 0f), Some(Seq(10L))),
      (2L, Array(0f, 1f), Some(Seq(20L)))))
    val run = Classify.knnJob(st, "v", "label_ref", k = 1, "run-4", ts)
    assert(run.status == "failed")
    assert(run.error.contains(
      "no classes to be classified - did you run a previous classification already?"))
    assert(st.version == 0) // nothing written
  }

  test("empty training set: items succeed meta-only with empty classifiedFields") {
    val st = mkStore(Seq(
      (100L, Array(1f, 0f), None),
      (101L, Array(0f, 1f), None)))
    val run = Classify.knnJob(st, "v", "label_ref", k = 3, "run-5", ts)
    assert(run == graft.pipeline.ClassificationRun("run-5", "completed", None, 2L, 2L, 0L))
    val back = st.read().orderBy($"id").collect()
    assert(back.forall(_.getAs[collection.Seq[Long]]("label_ref") == null))
    assert(back.forall(r =>
      r.getAs[Row](Classify.MetaCol).getAs[collection.Seq[String]]("classifiedFields") == Seq.empty))
    assert(back.forall(r =>
      r.getAs[Row](Classify.MetaCol).getAs[collection.Seq[String]]("scope") == Seq("label_ref")))
  }

  test("sourceWhere and trainingWhere AND onto the ref-count split") {
    // source filter excludes probe 101; training filter excludes id2, so the
    // probe's single neighbour is id1 → target 20
    val st = mkStore(Seq(
      (1L, Array(1f, 0f), Some(Seq(20L))),
      (2L, Array(1f, 0f), Some(Seq(10L))),
      (100L, Array(1f, 0f), None),
      (101L, Array(0f, 1f), None)))
    val run = Classify.knnJob(st, "v", "label_ref", k = 1, "run-6", ts,
      sourceWhere = Some(Where.ltInt("id", 101L)),
      trainingWhere = Some(Where.ltInt("id", 2L)))
    assert(run.count == 1L && run.countSucceeded == 1L)
    val back = st.read().collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(back(100L).getAs[collection.Seq[Long]]("label_ref") == Seq(20L))
    assert(back(101L).getAs[collection.Seq[Long]]("label_ref") == null)
    assert(back(101L).getAs[Row](Classify.MetaCol) == null)
  }

  test("meta-only success keeps a stored empty array ([] stays [], not null)") {
    val st = mkStore(Seq((100L, Array(1f, 0f), Some(Seq.empty[Long]))))
    val run = Classify.knnJob(st, "v", "label_ref", k = 3, "run-9", ts)
    assert(run.countSucceeded == 1L)
    val got = st.read().collect().head
    assert(got.getAs[collection.Seq[Long]]("label_ref") != null)
    assert(got.getAs[collection.Seq[Long]]("label_ref").isEmpty)
  }

  test("an index combined with trainingWhere is rejected (silent neighbour loss)") {
    val st = mkStore(Seq(
      (1L, Array(1f, 0f), Some(Seq(10L))),
      (2L, Array(0f, 1f), Some(Seq(20L))),
      (100L, Array(1f, 0f), None)))
    val ix = graft.ann.IvfIndex.build(
      st.read().filter($"label_ref".isNotNull), "id", "v", nlist = 2)
    val e = intercept[IllegalArgumentException] {
      Classify.knnJob(st, "v", "label_ref", k = 1, "run-10", ts,
        trainingWhere = Some(Where.ltInt("id", 5L)), index = Some(ix))
    }
    assert(e.getMessage.contains("rebuild the IvfIndex"))
  }

  test("an index containing non-training rows fails loudly instead of thinning") {
    val st = mkStore(Seq(
      (1L, Array(1f, 0f), Some(Seq(10L))),
      (2L, Array(0f, 1f), Some(Seq(20L))),
      (100L, Array(1f, 0f), None)))
    // index over the WHOLE store — row 100 is unclassified, so its ranked
    // self-neighbour is not a training row
    val ix = graft.ann.IvfIndex.build(st.read(), "id", "v", nlist = 2)
    val e = intercept[IllegalArgumentException] {
      Classify.knnJob(st, "v", "label_ref", k = 2, "run-11", ts, index = Some(ix))
    }
    assert(e.getMessage.contains("not training rows"))
  }

  test("a non-ref classify property is rejected (validation.go)") {
    val bad = CollectionSchema("Cls2", "id", Seq(Property("n", PropType.Int)))
    val st = new CollectionStore(spark,
      java.nio.file.Files.createTempDirectory("graft-clsjob").toString, bad)
    st.init(Seq((1L, Array(1f, 0f), 5L)).toDF("id", "v", "n"))
    val e = intercept[IllegalArgumentException] {
      Classify.knnJob(st, "v", "n", k = 1, "run-7", ts)
    }
    assert(e.getMessage.contains("not a cref property"))
  }

  test("_additional { classification } projects the stored meta through Get") {
    val st = mkStore(Seq(
      (1L, Array(1f, 0f), Some(Seq(10L))),
      (100L, Array(1f, 0f), None)))
    Classify.knnJob(st, "v", "label_ref", k = 1, "run-8", ts)
    val g = new Graft(spark).register(
      CollectionSchema("Cls", "id", Seq(
        Property("label_ref", PropType.Ref, refTarget = Some("Cls")))),
      st.read())
    val rows = g.get(GetParams("Cls",
      where = Some(Where.eqInt("id", 100L)),
      pagination = Some(Pagination(limit = 1)),
      properties = Seq("id"), additional = Set("classification"))).collect()
    assert(rows.length == 1)
    val meta = rows.head.getAs[Row](Classify.MetaCol)
    assert(meta.getAs[String]("id") == "run-8")
    assert(meta.getAs[collection.Seq[String]]("classifiedFields") == Seq("label_ref"))
  }
}
