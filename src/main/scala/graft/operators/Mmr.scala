package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/**
 * Maximal-Marginal-Relevance re-selection over a bounded top-k candidate pool
 * (reference: vector/selection/mmr.go:35; params retrieval.go:24-31):
 * iteratively pick argmax of λ·relevance − (1−λ)·max-similarity-to-selected.
 *
 * Deliberately driver-side (like the reference, and like autocut/merge-group):
 * the pool is ≤ a few hundred rows after TopK, so distributing the O(k²)
 * selection would only add shuffles (SURVEY §2.11).
 */
object Mmr {

  /** @param pool  candidate pool with id, vector and relevance columns
    * @param lambda balance: 1.0 = pure relevance, 0.0 = pure diversity */
  def rerank(pool: DataFrame, idCol: String, vecCol: String, relevanceCol: String,
             lambda: Double, k: Int): DataFrame = {
    val rows: Array[(Any, Array[Double], Double)] = pool
      .select(col(idCol), col(vecCol), col(relevanceCol).cast("double"))
      .collect()
      .map(r => (r.get(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getDouble(2)))

    def cosineSim(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Any, Double)]
    val remaining = scala.collection.mutable.ArrayBuffer(rows.indices: _*)
    while (selected.size < math.min(k, rows.length) && remaining.nonEmpty) {
      val scoresByIdx = remaining.map { i =>
        val (_, vec, rel) = rows(i)
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map { case (id, _) =>
            val j = rows.indexWhere(_._1 == id); cosineSim(vec, rows(j)._2)
          }.max
        i -> (lambda * rel - (1 - lambda) * maxSim)
      }
      val (bestIdx, bestScore) = scoresByIdx.maxBy(_._2)
      selected += ((rows(bestIdx)._1, bestScore))
      remaining -= bestIdx
    }

    val spark = pool.sparkSession
    val out = selected.zipWithIndex.map { case ((id, score), rank) =>
      Row(id, rank + 1, score)
    }
    val idField = pool.schema(idCol)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(idField.copy(name = "id"),
        StructField("mmr_rank", IntegerType), StructField("mmr_score", DoubleType))))
  }
}
