package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.model.FusionType
import graft.operators.HybridSearch

/**
 * relativeScoreFusion parity with the reference's own test matrix
 * (usecases/traverser/hybrid/fusion_test.go TestFusionRelativeScore — the
 * two-leg cases; scores asserted to 1e-4 like the reference).
 */
class FusionParitySpec extends SparkSpecBase {

  private def leg(scores: Seq[Double], colName: String) = {
    val schema = StructType(Seq(StructField("id", LongType), StructField(colName, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(scores.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }, 1),
      schema)
  }

  private def run(w1: Double, w2: Double, l1: Seq[Double], l2: Seq[Double]): Seq[(Long, Double)] =
    HybridSearch.fuse(leg(l1, "__s_sparse"), leg(l2, "__s_dense"), "id",
        FusionType.RelativeScore, w1, w2)
      .orderBy(col(HybridSearch.ScoreCol).desc,
        col(HybridSearch.SecondaryCol).desc_nulls_last, col("id").asc)
      .collect().map(r => (r.getLong(0), r.getAs[Double](HybridSearch.ScoreCol))).toSeq

  // (weights, leg1 scores, leg2 scores, expected order, expected scores)
  private val cases: Seq[((Double, Double), Seq[Double], Seq[Double], Seq[Long], Seq[Double])] = Seq(
    ((0.5, 0.5), Seq(1, 2, 3), Seq(0, 1, 2), Seq(2, 1, 0), Seq(1, 0.5, 0)),
    ((0.5, 0.5), Seq(0, 2, 0.1), Seq(0, 0.2, 2), Seq(1, 2, 0), Seq(0.55, 0.525, 0)),
    ((0.75, 0.25), Seq(0.5, 0.5, 0), Seq(0, 0.01, 0.001), Seq(1, 0, 2), Seq(1, 0.75, 0.025)),
    ((0.75, 0.25), Nil, Nil, Nil, Nil),
    ((0.75, 0.25), Seq(1), Nil, Seq(0), Seq(0.75)),
    ((0.75, 0.25), Nil, Seq(1), Seq(0), Seq(0.25)),
    ((0.75, 0.25), Seq(1, 2), Nil, Seq(1, 0), Seq(0.75, 0)),
    ((0.75, 0.25), Nil, Seq(1, 2), Seq(1, 0), Seq(0.25, 0)),
    ((0.75, 0.25), Seq(1, 1), Seq(1, 2), Seq(1, 0), Seq(1, 0.75)),
    ((0.75, 0.25), Seq(1, 2, 3, 4), Seq(1, 2, 3), Seq(3, 2, 1, 0), Seq(0.75, 0.75, 0.375, 0)))

  test("float32 tie band: sub-ulp score gaps fall through to the secondary") {
    // reference comparator (hybrid_fusion.go:68-79): float32 scores, ties
    // within 1e-7 resolved by SecondarySortValue desc, then id asc. id 0's
    // fused score exceeds id 1's by 2.5e-9 — invisible at float32 — and its
    // secondary is SMALLER, so the reference ranks id 1 first while an
    // exact-double sort would rank id 0 first.
    val rows = Seq((0L, 0.75 + 2.5e-9, 0.8), (1L, 0.75, 0.9))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, s, sec) => Row(i, s, sec) }, 1),
      StructType(Seq(StructField("id", LongType),
        StructField(HybridSearch.ScoreCol, DoubleType),
        StructField(HybridSearch.SecondaryCol, DoubleType))))
    val got = df.orderBy(HybridSearch.rankOrder("id"): _*)
      .collect().map(_.getLong(0)).toSeq
    // straight-line replay of the reference's epsilon comparator
    val exp = rows.sortWith { case ((ia, sa, ka), (ib, sb, kb)) =>
      val d = sb.toFloat - sa.toFloat
      if (d * d < 1e-14) {
        val d2 = kb.toFloat - ka.toFloat
        if (d2 * d2 < 1e-14) ia < ib else ka.toFloat > kb.toFloat
      } else sa.toFloat > sb.toFloat
    }.map(_._1)
    assert(got == exp)
    assert(got == Seq(1L, 0L)) // and the band genuinely changed the order
    val exactDouble = df.orderBy(col(HybridSearch.ScoreCol).desc)
      .collect().map(_.getLong(0)).toSeq
    assert(exactDouble == Seq(0L, 1L))
  }

  test("relativeScoreFusion matches the reference fusion_test.go matrix") {
    for ((((w1, w2), l1, l2, expOrder, expScores), i) <- cases.zipWithIndex) {
      val got = run(w1, w2, l1, l2)
      assert(got.map(_._1) == expOrder, s"case $i order: got ${got.map(_._1)} want $expOrder")
      got.map(_._2).zip(expScores).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-4, s"case $i score: got $g want $e")
      }
    }
  }

  test("explain fragments match fusion_test.go's wording") {
    // fusion_test.go:85-86 pins "(Result Set keyword) Document 1: original
    // score 0.5, normalized score: 0.5" / "(Result Set vector) ... original
    // score 2, normalized score: 0.5" over keyword [1, 0.5] vector [4, 2]
    // at weights 0.5/0.5
    val fused = HybridSearch.fuse(leg(Seq(1, 0.5), "__s_sparse"),
        leg(Seq(4, 2), "__s_dense"), "id", FusionType.RelativeScore, 0.5, 0.5)
      .orderBy(col("id").asc).collect()
    val doc1 = fused.find(_.getLong(0) == 1L).get
      .getAs[String](HybridSearch.ExplainCol)
    assert(doc1.contains("(Result Set keyword) Document 1: original score 0.5, normalized score: 0"))
    assert(doc1.contains("(Result Set vector) Document 1: original score 2, normalized score: 0"))
    // ranked fusion renders the contributed-RRF wording
    val ranked = HybridSearch.fuse(leg(Seq(1, 0.5), "__s_sparse"),
        leg(Seq(4, 2), "__s_dense"), "id", FusionType.Ranked, 0.5, 0.5)
      .orderBy(col("id").asc).collect()
    val r0 = ranked.find(_.getLong(0) == 0L).get
      .getAs[String](HybridSearch.ExplainCol)
    assert(r0.contains("(Result Set keyword) Document 0 contributed"))
    assert(r0.contains("to the score"))
  }
}
