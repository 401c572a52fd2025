package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityMetrics

/** Hand-computed fixture for the scores.go formulas (binary gains, natural
 * log, IDCG over ALL matching ids, p@5 = hits/(5·Q)). */
class QualityMetricsSpec extends SparkSpecBase {
  import spark.implicits._

  test("nDCG / p@1 / p@5 match the reference formulas on a hand-computed bed") {
    // q1: matching {1,2}; results rank1=doc1 (hit), rank2=doc5, rank3=doc2 (hit)
    // q2: matching {7};   results rank1=doc9,        rank2=doc7 (hit)
    // q3: matching {4};   no results at all (counts as zero everywhere)
    val results = Seq(
      (1L, 1L, 1), (1L, 5L, 2), (1L, 2L, 3),
      (2L, 9L, 1), (2L, 7L, 2)).toDF("qid", "doc", "rank")
    val qrels = Seq((1L, 1L), (1L, 2L), (2L, 7L), (3L, 4L)).toDF("qid", "doc")

    val row = QualityMetrics.scores(results, $"qid", $"doc", $"rank",
      qrels, $"qid", $"doc").head()

    def ln(x: Double) = math.log(x)
    val ndcg1 = (1 / ln(2) + 1 / ln(4)) / (1 / ln(2) + 1 / ln(3))
    val ndcg2 = (1 / ln(3)) / (1 / ln(2))
    val expectedNdcg = (ndcg1 + ndcg2 + 0.0) / 3
    assert(math.abs(row.getAs[Double]("ndcg") - expectedNdcg) < 1e-12)
    assert(math.abs(row.getAs[Double]("p_at_1") - 1.0 / 3) < 1e-12)   // only q1 hit@1
    assert(math.abs(row.getAs[Double]("p_at_5") - 3.0 / 15) < 1e-12)  // 2 + 1 + 0 hits
    assert(row.getAs[Long]("num_queries") == 3L)

    // perfect ranking of exactly the matching set → nDCG 1, both precisions top
    val perfect = Seq((1L, 1L, 1), (1L, 2L, 2)).toDF("qid", "doc", "rank")
    val prow = QualityMetrics.scores(perfect, $"qid", $"doc", $"rank",
      qrels.filter($"qid" === 1L), $"qid", $"doc").head()
    assert(math.abs(prow.getAs[Double]("ndcg") - 1.0) < 1e-12)
    assert(math.abs(prow.getAs[Double]("p_at_1") - 1.0) < 1e-12)
    assert(math.abs(prow.getAs[Double]("p_at_5") - 2.0 / 5) < 1e-12)
  }

  test("plan shape: equi-join + hash aggs, no window, no cartesian") {
    val results = Seq((1L, 1L, 1)).toDF("qid", "doc", "rank")
    val qrels = Seq((1L, 1L)).toDF("qid", "doc")
    val plan = QualityMetrics.scores(results, $"qid", $"doc", $"rank",
      qrels, $"qid", $"doc").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"))
  }
}
