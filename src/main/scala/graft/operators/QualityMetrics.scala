package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BEIR-style ranking-quality metrics against binary qrels — the reference's
 * benchmark measurement surface (test/benchmark_bm25/lib/scores.go:28-70),
 * re-expressed as one distributed aggregation instead of a per-query driver
 * loop:
 *
 *  - nDCG: per query, DCG = Σ over relevant results of 1/ln(rank₀+2) with
 *    BINARY gains and NATURAL log (scores.go:46 `1 / math.Log(rank+2)`),
 *    IDCG = Σ_{j=0}^{m-1} 1/ln(j+2) over ALL m matching ids — not capped at
 *    the result-list length (scores.go:29-32) — reported as the mean of
 *    DCG/IDCG over queries;
 *  - p@1 = hits at rank 1 / #queries (scores.go:61-63);
 *  - p@5 = hits in the top 5 / (5 · #queries) (scores.go:65-67).
 *
 * Queries present in qrels but returning no (relevant) results still count
 * in every denominator — exactly `AddResult` with an empty result list.
 * Qrels are expected deduplicated per (query, doc); duplicate rows would
 * double-count exactly as duplicated matchingIds do in the reference.
 *
 * Scale shape: results ⋈ qrels is an equi-join on (query, doc); everything
 * else is per-query hash aggregation with map-side partials + one global
 * agg row — no window, no collect, linear in |results| + |qrels|.
 */
object QualityMetrics {

  /** One row: (ndcg, p_at_1, p_at_5, num_queries). `rankCol` is the 1-based
   * result rank within its query (so 1/ln(rank+1) ≡ the reference's 0-based
   * 1/ln(rank+2)). The query universe is the DISTINCT query set of `qrels`. */
  def scores(results: DataFrame, qCol: Column, docCol: Column, rankCol: Column,
             qrels: DataFrame, relQCol: Column, relDocCol: Column): DataFrame = {
    val res = results.select(qCol.as("__q"), docCol.as("__d"),
      rankCol.cast("long").as("__rank"))
    val rel = qrels.select(relQCol.as("__q"), relDocCol.as("__d"))
    // IDCG from the per-query matching count m: Σ_{j=2}^{m+1} 1/ln(j)
    val idcg = rel.groupBy(col("__q")).agg(count(lit(1)).as("__m"))
      .withColumn("__idcg", expr(
        "aggregate(sequence(2L, __m + 1L), CAST(0 AS DOUBLE), (a, j) -> a + 1.0 / ln(j))"))
    val perQ = res.join(rel, Seq("__q", "__d"), "left_semi")
      .groupBy(col("__q")).agg(
        sum(lit(1.0) / log(col("__rank") + 1)).as("__dcg"),
        sum(when(col("__rank") === 1, 1L).otherwise(0L)).as("__h1"),
        sum(when(col("__rank") <= 5, 1L).otherwise(0L)).as("__h5"))
    idcg.join(perQ, Seq("__q"), "left").agg(
      avg(coalesce(col("__dcg"), lit(0.0)) / col("__idcg")).as("ndcg"),
      (sum(coalesce(col("__h1"), lit(0L))).cast("double") / count(lit(1))).as("p_at_1"),
      (sum(coalesce(col("__h5"), lit(0L))).cast("double") / (count(lit(1)) * 5)).as("p_at_5"),
      count(lit(1)).as("num_queries"))
  }
}
