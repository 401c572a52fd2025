package graft

import org.apache.spark.sql.functions._

import graft.model.{Bm25, SearchOperator}
import graft.operators.{Bm25Search, Postings}

/** The postings-table BM25 path must reproduce the scan path bit-for-bit
 * (same formula, different physical plan). */
class PostingsSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("postings search == scan search (scores within 1e-9, same order)") {
    val g = Fixtures.graft(spark, sf)
    val c = g.collection("Document")
    val idx = Postings.build(c, "text")
    for (q <- Seq("spark join stream", "table scan")) {
      val scan = Bm25Search.search(c, Bm25(q, Seq("text")), 20)
        .select(col("doc_id"), col(Bm25Search.ScoreCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val posted = Postings.search(idx, q, 20)
        .select(col("doc_id"), col(Bm25Search.ScoreCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(scan.map(_._1).toSeq == posted.map(_._1).toSeq, s"doc order differs for '$q'")
      scan.zip(posted).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("block-max pruned search (WAND analogue) is exact vs unpruned") {
    val g = Fixtures.graft(spark, sf)
    val c = g.collection("Document")
    val idx = Postings.build(c, "text", buckets = 16)
    for (q <- Seq("spark join stream", "window dup", "table hash merge sort")) {
      val full = Postings.search(idx, q, 15)
        .select(col("doc_id"), col(Bm25Search.ScoreCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val pruned = Postings.searchPruned(idx, q, 15)
        .select(col("doc_id"), col(Bm25Search.ScoreCol))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(full.map(_._1) == pruned.map(_._1), s"doc order differs for '$q'")
      full.zip(pruned).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("postings And-operator matches scan path") {
    val g = Fixtures.graft(spark, sf)
    val c = g.collection("Document")
    val idx = Postings.build(c, "text")
    val scan = Bm25Search.search(c, Bm25("table scan merge", Seq("text"),
      SearchOperator.AndOp), 50).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val posted = Postings.search(idx, "table scan merge", 50, SearchOperator.AndOp)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(scan == posted)
  }
}
