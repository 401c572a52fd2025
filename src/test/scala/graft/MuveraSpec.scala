package graft

import org.apache.spark.sql.functions._

import graft.ann.{Muvera, MuveraEncoder}
import org.apache.spark.sql.graft.VectorFunctions
import graft.operators.VectorSearch

/**
 * Muvera fixed-dim encoding vs exact MaxSim (reference:
 * vector/multivector/muvera.go; recall bar mirrors compress_recall_test.go:144).
 */
class MuveraSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(11)

  /** 300 docs, each a bag of 2-5 token vectors drawn near one of 15 topic
   * centers — the clustered-topic workload MaxSim search serves. */
  private lazy val rows: Seq[(Long, Seq[Seq[Float]])] = {
    val centers = Array.fill(15)(Array.fill(dim)(rnd.nextGaussian()))
    (0 until 300).map { i =>
      val c = centers(i % 15)
      val n = 2 + rnd.nextInt(4)
      val bag = Seq.fill(n)(c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
      (i.toLong, bag)
    }
  }
  private lazy val docs = rows.toDF("id", "mvec")

  private lazy val enc = MuveraEncoder(ksim = 3, dproj = 8, reps = 6, dim = dim)
  private lazy val encoded = Muvera.encodeDocs(docs, $"mvec", enc).cache()

  private def query: Array[Array[Float]] = rows(7)._2.map(_.toArray).toArray

  private def exactTop(k: Int): Seq[Long] = {
    val qLit = typedLit(query.map(_.toSeq).toSeq)
    docs.withColumn(VectorSearch.DistanceCol, VectorFunctions.maxSim(qLit, $"mvec"))
      .orderBy(col(VectorSearch.DistanceCol).asc, $"id".asc).limit(k)
      .select($"id").collect().map(_.getLong(0)).toSeq
  }

  test("query/doc encoding dot product approximates MaxSim ranking: recall@10 >= 0.9") {
    val truth = exactTop(10).toSet
    val got = Muvera.search(encoded, "id", "__muvera", "mvec", query, enc,
        topK = 10, rescoreFactor = 8)
      .select($"id").collect().map(_.getLong(0)).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9, s"muvera recall $recall < 0.9 ($got vs $truth)")
  }

  test("rescore distances are the exact MaxSim values; full rescore = exact scan") {
    // rescoreFactor covering the whole corpus makes the candidate pass a
    // no-op, so the result must equal the brute-force MaxSim top-k exactly
    val got = Muvera.search(encoded, "id", "__muvera", "mvec", query, enc,
        topK = 10, rescoreFactor = 30)
      .select($"id").collect().map(_.getLong(0)).toSeq
    assert(got == exactTop(10))
  }

  test("parquet-backed first pass scans only (id, encoding) — never the token bags") {
    val dir = java.nio.file.Files.createTempDirectory("graft-muvera").toString
    encoded.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val fp = Muvera.firstPass(onDisk, "id", "__muvera", enc.encodeQuery(query), 40)
    val scan = fp.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    val read = scan.metadata("ReadSchema")
    assert(read.contains("__muvera") && !read.contains("mvec"),
      s"first pass reads the token bags: $read")
  }

  test("engine path: registered muvera serves unfiltered nearMultiVector; filters stay exact") {
    import graft.engine.Graft
    import graft.model._
    val schema = CollectionSchema("Mv", "id",
      Seq(Property("flag", PropType.Int)),
      vectors = Map("default" -> "mvec"), defaultVector = Some("default"))
    val g = new Graft(spark).register(schema, docs.withColumn("flag", ($"id" % 2).cast("int")))
      .registerMuvera("Mv", None, enc,
        persistPath = Some(java.nio.file.Files.createTempDirectory("graft-muvera-reg").toString))
    // unfiltered → muvera first pass + rescore; generous k makes it exact
    val got = g.get(GetParams("Mv",
      nearMultiVector = Some(NearMultiVector(query)),
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"), additional = Set("distance")))
      .select($"id").as[Long].collect().toSeq
    val truth = exactTop(10)
    assert(got.toSet.intersect(truth.toSet).size >= 9, s"engine muvera recall too low: $got vs $truth")
    // filtered → exact MaxSim over the allowlist (muvera bypassed): parity
    // with the brute-force path on the filtered frame is exact, not approx
    val filteredGot = g.get(GetParams("Mv",
      where = Some(Where.eqInt("flag", 1L)),
      nearMultiVector = Some(NearMultiVector(query)),
      pagination = Some(Pagination(limit = 5)),
      properties = Seq("id"))).select($"id").as[Long].collect().toSeq
    val qLit = typedLit(query.map(_.toSeq).toSeq)
    val filteredTruth = docs.filter(($"id" % 2) === 1)
      .withColumn(VectorSearch.DistanceCol, VectorFunctions.maxSim(qLit, $"mvec"))
      .orderBy(col(VectorSearch.DistanceCol).asc, $"id".asc).limit(5)
      .select($"id").as[Long].collect().toSeq
    assert(filteredGot == filteredTruth)
  }

  test("stale muvera encodings are NOT served after the collection changes version") {
    import graft.engine.Graft
    import graft.model._
    val schema = CollectionSchema("Mv2", "id", Nil,
      vectors = Map("default" -> "mvec"), defaultVector = Some("default"))
    val g = new Graft(spark).register(schema, docs).registerMuvera("Mv2", None, enc)
    // mutate the collection: drop the exact top-1 doc and re-register (a new
    // store version). The stale encoded table still contains it — serving
    // from it would resurrect the deleted doc.
    val top1 = exactTop(1).head
    g.register(schema, docs.filter($"id" =!= top1))
    val got = g.get(GetParams("Mv2",
      nearMultiVector = Some(NearMultiVector(query)),
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"))).select($"id").as[Long].collect().toSeq
    assert(!got.contains(top1), "stale muvera encoding served a deleted doc")
    // version-gated fallback is the exact scan over the NEW collection
    val qLit = typedLit(query.map(_.toSeq).toSeq)
    val truth = docs.filter($"id" =!= top1)
      .withColumn(VectorSearch.DistanceCol, VectorFunctions.maxSim(qLit, $"mvec"))
      .orderBy(col(VectorSearch.DistanceCol).asc, $"id".asc).limit(10)
      .select($"id").as[Long].collect().toSeq
    assert(got == truth)
  }

  test("encoding is deterministic and has the declared dimension") {
    assert(enc.outDim == 6 * 8 * 8)
    val e1 = enc.encodeDoc(query); val e2 = enc.encodeDoc(query)
    assert(e1.toSeq == e2.toSeq && e1.length == enc.outDim)
    // query and doc encodings differ (sum vs average + empty-cluster fill)
    val q1 = enc.encodeQuery(query)
    assert(q1.toSeq != e1.toSeq)
  }
}
