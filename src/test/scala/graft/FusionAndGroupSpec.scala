package graft

import org.apache.spark.sql.functions._

import graft.model.FusionType
import graft.operators.{HybridSearch, ResultGroupBy}

class FusionAndGroupSpec extends SparkSpecBase {
  import spark.implicits._

  test("rankedFusion (RRF) = sum of w/(60+rank)") {
    val sparse = Seq((1L, 10.0), (2L, 8.0), (3L, 5.0)).toDF("id", "__s_sparse")
    val dense = Seq((2L, 0.9), (3L, 0.8), (4L, 0.7)).toDF("id", "__s_dense")
    val out = HybridSearch.fuse(sparse, dense, "id", FusionType.Ranked, 0.3, 0.7)
      .collect().map(r => r.getLong(0) -> r.getAs[Double](HybridSearch.ScoreCol)).toMap
    assert(math.abs(out(1L) - 0.3 / 61) < 1e-12)
    assert(math.abs(out(2L) - (0.3 / 62 + 0.7 / 61)) < 1e-12)
    assert(math.abs(out(3L) - (0.3 / 63 + 0.7 / 62)) < 1e-12)
    assert(math.abs(out(4L) - 0.7 / 63) < 1e-12)
  }

  test("relativeScoreFusion min-max normalizes each leg") {
    val sparse = Seq((1L, 10.0), (2L, 5.0)).toDF("id", "__s_sparse")
    val dense = Seq((1L, 0.5), (2L, 1.0)).toDF("id", "__s_dense")
    val out = HybridSearch.fuse(sparse, dense, "id", FusionType.RelativeScore, 0.5, 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[Double](HybridSearch.ScoreCol)).toMap
    assert(math.abs(out(1L) - (0.5 * 1.0 + 0.5 * 0.0)) < 1e-12)
    assert(math.abs(out(2L) - (0.5 * 0.0 + 0.5 * 1.0)) < 1e-12)
  }

  test("autocut cuts before the first extremum (reference semantics)") {
    // scores: big cliff after rank 3 → diff curve has a local max at i=3
    val ranked = Seq((1L, 1.00), (2L, 0.99), (3L, 0.98), (4L, 0.30), (5L, 0.29))
      .toDF("id", "s")
    val kept = HybridSearch.autocut(ranked, col("s"), col("id"), 1)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("autocut with no extremum keeps everything (linear curve)") {
    // exactly-representable linear curve: ynorm_i == i/(n-1) bit-for-bit
    val ranked = Seq((1L, 1.0), (2L, 0.75), (3L, 0.5), (4L, 0.25)).toDF("id", "s")
    val kept = HybridSearch.autocut(ranked, col("s"), col("id"), 1).count()
    assert(kept == 4)
  }

  test("greedy result grouping: group order by best rank, caps respected") {
    val ranked = Seq(
      (1L, 1, "a"), (2L, 2, "b"), (3L, 3, "a"), (4L, 4, "c"),
      (5L, 5, "b"), (6L, 6, "a"), (7L, 7, "c"), (8L, 8, "d"))
      .toDF("id", "rnk", "grp")
    val out = ResultGroupBy(ranked, "rnk", "grp", groups = 2, objectsPerGroup = 2)
      .select($"group_index", $"group_value", $"group_hit_rank", $"id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    // groups kept: a (best rank 1), b (best rank 2); 2 hits each
    assert(out == Set((1, "a", 1, 1L), (1, "a", 2, 3L), (2, "b", 1, 2L), (2, "b", 2, 5L)))
  }
}
