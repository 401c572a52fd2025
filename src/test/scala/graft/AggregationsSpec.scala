package graft

import org.apache.spark.sql.functions._

import graft.engine.Graft
import graft.model._
import graft.operators.Aggregations

class AggregationsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val g: Graft = {
    val gg = new Graft(spark)
    val df = Seq(
      (1L, "tech", 10.0, true), (2L, "tech", 20.0, true), (3L, "tech", 30.0, false),
      (4L, "food", 5.0, false), (5L, "food", 5.0, true))
      .toDF("id", "sector", "price", "listed")
    gg.register(CollectionSchema("Company", "id", Seq(
      Property("sector", PropType.Text, Tokenization.Field),
      Property("price", PropType.Number),
      Property("listed", PropType.Bool))), df)
    gg
  }

  test("grouped numeric aggregations") {
    val out = g.aggregate(AggregateParams("Company",
      groupBy = Some(Seq("sector")),
      properties = Map("price" -> Seq(Aggregator.Sum, Aggregator.Mean, Aggregator.Median))))
      .collect().map(r => r.getAs[String]("groupedBy_value") ->
        (r.getAs[Double]("price_sum"), r.getAs[Double]("price_mean"), r.getAs[Double]("price_median"))).toMap
    assert(out("tech") == ((60.0, 20.0, 20.0)))
    assert(out("food") == ((10.0, 5.0, 5.0)))
  }

  test("boolean aggregations") {
    val out = g.aggregate(AggregateParams("Company",
      properties = Map("listed" -> Seq(
        Aggregator.TotalTrue, Aggregator.PercentageTrue)))).head()
    assert(out.getAs[Long]("listed_totalTrue") == 3L)
    assert(math.abs(out.getAs[Double]("listed_percentageTrue") - 0.6) < 1e-12)
  }

  test("deterministic exact mode (ties -> smallest value)") {
    val df = Seq((1, 1), (1, 2), (1, 2), (1, 3), (1, 3)).toDF("g", "v")
    val m = Aggregations.modeExact(df, Seq(col("g")), col("v")).head().getAs[Int]("mode")
    assert(m == 2) // 2 and 3 both occur twice; smallest wins
  }

  test("single-pass deterministicMode pins ties to the smallest value") {
    val df = Seq((1, 2), (1, 2), (1, 3), (1, 3)).toDF("g", "v")
    val m = df.groupBy(col("g"))
      .agg(Aggregations.deterministicMode(col("v")).as("m"))
      .head().getAs[Int]("m")
    assert(m == 2) // same pinned order as modeExact
  }

  test("topOccurrences ranks by count desc then value asc") {
    val df = Seq("a", "a", "b", "b", "c").map(Tuple1(_)).toDF("v")
    val rows = Aggregations.topOccurrences(df, Nil, col("v"), 2)
      .orderBy($"rank").collect().map(r => (r.getAs[String]("value"), r.getAs[Long]("occurs")))
    assert(rows.toSeq == Seq(("a", 2L), ("b", 2L)))
  }

  test("filtered aggregation scopes all aggregators") {
    val out = g.aggregate(AggregateParams("Company",
      where = Some(Where.eqText("sector", "tech")),
      properties = Map("price" -> Seq(Aggregator.Count, Aggregator.Maximum)))).head()
    assert(out.getAs[Long]("price_count") == 3L)
    assert(out.getAs[Double]("price_maximum") == 30.0)
  }

  test("type / pointingTo are schema lookups (no scan)") {
    val info = Aggregations.typeInfo(g.collection("Company"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(info == Set(("sector", "text", ""), ("price", "number", ""), ("listed", "boolean", "")))
    // engine-served aggregator form: rides a normal agg row
    val row = g.aggregate(AggregateParams("Company",
      properties = Map("price" -> Seq(Aggregator.Type, Aggregator.Count)))).head()
    assert(row.getAs[String]("price_type") == "number")
    assert(row.getAs[Long]("price_count") == 5L)
    // pointingTo on a non-cref property is a loud error
    val e = intercept[IllegalArgumentException] {
      g.aggregate(AggregateParams("Company",
        properties = Map("price" -> Seq(Aggregator.PointingTo))))
    }
    assert(e.getMessage.contains("requires a cref property"))
  }

  test("topOccurrences as a single agg column (array<struct>)") {
    val out = g.aggregate(AggregateParams("Company",
      properties = Map("sector" -> Seq(Aggregator.TopOccurrences(2))))).head()
    val top = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("sector_topOccurrences"))
    assert(top.map(r => (r.getString(1), r.getInt(0))) == Seq(("tech", 3), ("food", 2)))
  }

  test("array properties aggregate element-wise, incl. exact median/mode") {
    val gg = new Graft(spark)
    gg.register(CollectionSchema("Tagged", "id", Seq(
      Property("tags", PropType.Arr(PropType.Text), Tokenization.Field),
      Property("vals", PropType.Arr(PropType.Number)))),
      Seq(
        (1L, Seq("a", "b"), Seq(1.0, 2.0)),
        (2L, Seq("a"), Seq(3.0)),
        (3L, Seq.empty[String], Seq.empty[Double]))
        .toDF("id", "tags", "vals"))
    val row = gg.aggregate(AggregateParams("Tagged",
      properties = Map(
        "tags" -> Seq(Aggregator.Count, Aggregator.TopOccurrences(2)),
        "vals" -> Seq(Aggregator.Count, Aggregator.Sum, Aggregator.Mean,
          Aggregator.Minimum, Aggregator.Maximum)))).head()
    assert(row.getAs[Long]("tags_count") == 3L)       // elements, not rows
    assert(row.getAs[Long]("vals_count") == 3L)
    assert(row.getAs[Double]("vals_sum") == 6.0)
    assert(row.getAs[Double]("vals_mean") == 2.0)
    assert(row.getAs[Double]("vals_minimum") == 1.0)
    assert(row.getAs[Double]("vals_maximum") == 3.0)
    val top = row.getSeq[org.apache.spark.sql.Row](
      row.fieldIndex("tags_topOccurrences"))
    assert(top.map(t => (t.getInt(0), t.getString(1))) == Seq((2, "a"), (1, "b")))
    // median/mode run over the flattened element multiset via the
    // explode side-aggregation (round 13 — the reference's *Array
    // analyzers feed elements through the same numerical path)
    val mm = gg.aggregate(AggregateParams("Tagged",
      properties = Map("vals" -> Seq(Aggregator.Median, Aggregator.Mode)))).head()
    assert(mm.getAs[Double]("vals_median") == 2.0)
    assert(mm.getAs[Double]("vals_mode") == 1.0) // all counts 1 → smallest
  }

  test("meta count only") {
    val out = g.aggregate(AggregateParams("Company", includeMetaCount = true)).head()
    assert(out.getAs[Long]("meta_count") == 5L)
  }

  private lazy val gVec: Graft = {
    val gg = new Graft(spark).withEmbedder(Fixtures.hashEmbedder(8))
    val df = Seq(
      (1L, 1L, Array(0.0f, 0.0f)), (2L, 2L, Array(0.1f, 0.0f)),
      (3L, 3L, Array(0.2f, 0.0f)), (4L, 4L, Array(9.0f, 9.0f)))
      .toDF("id", "label", "vec")
    gg.register(graft.engine.Collection(CollectionSchema("Pt", "id", Seq(
      Property("label", PropType.Int)),
      vectors = Map("default" -> "vec"), defaultVector = Some("default")), df))
  }

  test("nearObject-scoped aggregation resolves the anchor's vector") {
    val out = gVec.aggregate(AggregateParams("Pt",
      properties = Map("label" -> Seq(Aggregator.Sum)),
      includeMetaCount = true,
      nearObject = Some(NearObject(1L, metric = Metric.L2Squared)),
      objectLimit = Some(3))).head()
    assert(out.getAs[Long]("meta_count") == 3L)
    assert(out.getAs[Long]("label_sum") == 6L) // ids 1,2,3 — not the far point 4
  }

  test("vector-scoped aggregation without objectLimit or threshold fails loudly") {
    val e = intercept[IllegalArgumentException] {
      gVec.aggregate(AggregateParams("Pt",
        properties = Map("label" -> Seq(Aggregator.Sum)),
        nearObject = Some(NearObject(1L))))
    }
    assert(e.getMessage.contains("must provide certainty or objectLimit"))
  }

  test("aggregate keyword leg drops unsearchable props; Get errors (ChooseSearchableProperties)") {
    // aggregator/filtered.go:142 silently filters, the Get path errors
    // (WEAVIATE-471) — two different reference behaviors, both pinned
    val g = Fixtures.graft(spark, "/root/testdata/sf0.001")
    val agg = g.aggregate(AggregateParams("Document",
      properties = Map("n_chars" -> Seq(Aggregator.Count)),
      hybrid = Some(Hybrid("spark join", alpha = 0.0,
        properties = Seq("text", "n_chars"))), // n_chars: Int, unsearchable
      objectLimit = Some(10)))
    assert(agg.count() == 1)
    val e = intercept[IllegalArgumentException] {
      g.get(GetParams("Document",
        bm25 = Some(Bm25("spark join", properties = Seq("text", "n_chars"))),
        pagination = Some(Pagination(limit = 5)))).collect()
    }
    assert(e.getMessage.contains("requires inverted index"))
  }
}
