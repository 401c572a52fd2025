package graft

import graft.engine.{Graft, WireDecoder}
import graft.model._

/**
 * Wire-format decoder parity: a JSON SearchRequest/AggregateRequest decodes
 * to EXACTLY the GetParams/AggregateParams a programmatic caller builds, and
 * malformed inputs replay the reference's parse-time validation errors
 * (adapters/handlers/grpc/v1/parse_search_request.go, filters.go).
 */
class WireDecoderSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val g: Graft = Fixtures.graft(spark, sf)

  private def err(json: String): String =
    intercept[IllegalArgumentException](WireDecoder.search(g, json)).getMessage

  test("filters: And tree with text/number/date leaves matches the programmatic twin") {
    val decoded = WireDecoder.search(g,
      """{"collection": "Lineitem", "limit": 100000,
        |  "properties": {"nonRefProperties": ["l_orderkey", "l_linenumber"]},
        |  "filters": {"operator": "OPERATOR_AND", "filters": [
        |    {"operator": "OPERATOR_EQUAL", "on": ["l_returnflag"], "valueText": "R"},
        |    {"operator": "OPERATOR_GREATER_THAN", "on": ["l_quantity"], "valueNumber": 30.0},
        |    {"operator": "OPERATOR_LESS_THAN", "on": ["l_shipdate"], "valueText": "1995-06-17"}]}}""".stripMargin)
    val twin = GetParams("Lineitem",
      where = Some(Where.and(
        Where.eqText("l_returnflag", "R"),
        Where.gtNum("l_quantity", 30.0),
        Where.ltDate("l_shipdate", "1995-06-17"))),
      properties = Seq("l_orderkey", "l_linenumber"),
      pagination = Some(Pagination(0, 100000)))
    assert(decoded == twin)
  }

  test("filters: snake_case keys and short operator names decode identically") {
    val decoded = WireDecoder.search(g,
      """{"collection": "Lineitem", "limit": 100000,
        |  "properties": {"non_ref_properties": ["l_orderkey"]},
        |  "filters": {"operator": "Equal", "on": ["l_returnflag"], "value_text": "R"}}""".stripMargin)
    assert(decoded.where.contains(Where.eqText("l_returnflag", "R")))
    assert(decoded.properties == Seq("l_orderkey"))
  }

  test("filters: old-style on-path and new-style singleTarget chain produce the same 2-hop Where") {
    val onStyle = WireDecoder.search(g,
      """{"collection": "Order", "limit": 99,
        |  "filters": {"operator": "OPERATOR_EQUAL",
        |    "on": ["o_custkey", "Customer", "c_nationkey", "Nation", "n_name"],
        |    "valueText": "NATION_7"}}""".stripMargin)
    val targetStyle = WireDecoder.search(g,
      """{"collection": "Order", "limit": 99,
        |  "filters": {"operator": "OPERATOR_EQUAL",
        |    "target": {"singleTarget": {"on": "o_custkey",
        |      "target": {"singleTarget": {"on": "c_nationkey",
        |        "target": {"property": "n_name"}}}}},
        |    "valueText": "NATION_7"}}""".stripMargin)
    val expected = Where(WhereOp.Equal,
      Seq("o_custkey", "Customer", "c_nationkey", "Nation", "n_name"),
      Some(FilterValue.TextV("NATION_7")))
    assert(onStyle.where.contains(expected))
    assert(targetStyle.where.contains(expected))
  }

  test("filters: count target and len() pseudo-prop type as Int") {
    val cnt = WireDecoder.search(g,
      """{"collection": "Document", "limit": 5,
        |  "filters": {"operator": "OPERATOR_GREATER_THAN",
        |    "target": {"count": {"on": "links"}}, "valueInt": 2}}""".stripMargin)
    assert(cnt.where.contains(Where(WhereOp.GreaterThan, Seq("links"), Some(FilterValue.IntV(2)))))
    val len = WireDecoder.search(g,
      """{"collection": "Document", "limit": 5,
        |  "filters": {"operator": "OPERATOR_GREATER_THAN", "on": ["len(text)"], "valueNumber": 350}}""".stripMargin)
    assert(len.where.contains(Where(WhereOp.GreaterThan, Seq("len(text)"), Some(FilterValue.IntV(350)))))
  }

  test("filters: int/number coercion and the reference's floatToInt guards") {
    // whole float on an int prop → IntV
    val ok = WireDecoder.search(g,
      """{"collection": "Part", "limit": 5,
        |  "filters": {"operator": "OPERATOR_EQUAL", "on": ["p_size"], "valueNumber": 2.0}}""".stripMargin)
    assert(ok.where.contains(Where(WhereOp.Equal, Seq("p_size"), Some(FilterValue.IntV(2)))))
    // int on a number prop → NumberV
    val num = WireDecoder.search(g,
      """{"collection": "Part", "limit": 5,
        |  "filters": {"operator": "OPERATOR_GREATER_THAN", "on": ["p_retailprice"], "valueInt": 900}}""".stripMargin)
    assert(num.where.contains(Where(WhereOp.GreaterThan, Seq("p_retailprice"), Some(FilterValue.NumberV(900.0)))))
    // fractional on an int prop → the reference's error, verbatim
    assert(err(
      """{"collection": "Part", "limit": 5,
        |  "filters": {"operator": "OPERATOR_EQUAL", "on": ["p_size"], "valueNumber": 2.3}}""".stripMargin)
      == "filtering for integer, but received a floating point number 2.3")
    // unparseable string on a number prop
    assert(err(
      """{"collection": "Part", "limit": 5,
        |  "filters": {"operator": "OPERATOR_EQUAL", "on": ["p_retailprice"], "valueText": "abc"}}""".stripMargin)
      == "expected a number value, but could not parse string 'abc' as float")
    // contains int-array on a number prop coerces elementwise
    val ca = WireDecoder.search(g,
      """{"collection": "Part", "limit": 5,
        |  "filters": {"operator": "OPERATOR_CONTAINS_ANY", "on": ["p_size"],
        |    "valueNumberArray": {"values": [5, 10.0]}}}""".stripMargin)
    assert(ca.where.contains(Where(WhereOp.ContainsAny, Seq("p_size"),
      Some(FilterValue.ListV(Seq(FilterValue.IntV(5), FilterValue.IntV(10)))))))
  }

  test("filters: even-length on path and unknown operator replay reference errors") {
    assert(err(
      """{"collection": "Order", "limit": 5,
        |  "filters": {"operator": "OPERATOR_EQUAL", "on": ["o_custkey", "Customer"], "valueText": "x"}}""".stripMargin)
      == "paths needs to have a uneven number of components: property, class, property, ...., got [o_custkey Customer]")
    assert(err(
      """{"collection": "Order", "limit": 5,
        |  "filters": {"operator": "OPERATOR_FROBNICATE", "on": ["o_orderstatus"], "valueText": "F"}}""".stripMargin)
      == "unknown filter operator OPERATOR_FROBNICATE")
  }

  test("filters: geo value decodes to GeoRangeV") {
    val geo = WireDecoder.search(g,
      """{"collection": "Customer", "limit": 100000,
        |  "properties": {"nonRefProperties": ["c_custkey"]},
        |  "filters": {"operator": "OPERATOR_WITHIN_GEO_RANGE", "on": ["geo"],
        |    "valueGeo": {"latitude": 10.0, "longitude": 20.0, "distance": 6.0e6}}}""".stripMargin)
    assert(geo.where.contains(Where(WhereOp.WithinGeoRange, Seq("geo"),
      Some(FilterValue.GeoRangeV(10.0, 20.0, 6.0e6)))))
  }

  test("nearVector: vector + distance, base64 vectorBytes, and dual-threshold error") {
    val j = WireDecoder.search(g,
      """{"collection": "Embedding", "limit": 10,
        |  "metadata": {"distance": true},
        |  "nearVector": {"vector": [0.25, -0.5, 1.0], "distance": 0.4}}""".stripMargin)
    val nv = j.nearVector.get
    assert(nv.vector.toSeq == Seq(0.25f, -0.5f, 1.0f))
    assert(nv.distance.contains(0.4) && nv.certainty.isEmpty)
    assert(nv.metric == Metric.Default)
    assert(j.additional == Set("distance"))

    // little-endian fp32 bytes, like byteops.Fp32SliceFromBytes
    val bb = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(0.25f).putFloat(-0.5f).putFloat(1.0f)
    val b64 = java.util.Base64.getEncoder.encodeToString(bb.array())
    val viaBytes = WireDecoder.search(g,
      s"""{"collection": "Embedding", "limit": 10,
         |  "nearVector": {"vectorBytes": "$b64"}}""".stripMargin)
    assert(viaBytes.nearVector.get.vector.toSeq == Seq(0.25f, -0.5f, 1.0f))

    assert(err(
      """{"collection": "Embedding", "limit": 10,
        |  "nearVector": {"vector": [1.0], "distance": 0.4, "certainty": 0.9}}""".stripMargin)
      == "near_vector: cannot provide distance and certainty")
    assert(err(
      """{"collection": "Embedding", "limit": 10, "nearVector": {}}""")
      == "near_vector: vector is required")
  }

  test("nearVector: targets with manual weights and per-target vectors") {
    val j = WireDecoder.search(g,
      """{"collection": "Embedding", "limit": 10,
        |  "nearVector": {
        |    "vectorForTargets": [
        |      {"name": "default", "vector": [1.0, 0.0]},
        |      {"name": "rev", "vector": [0.0, 1.0]}],
        |    "targets": {"targetVectors": ["default", "rev"],
        |      "combination": "COMBINATION_METHOD_TYPE_MANUAL",
        |      "weightsForTargets": [
        |        {"target": "default", "weight": 2.0}, {"target": "rev", "weight": 1.0}]}}}""".stripMargin)
    val nv = j.nearVector.get
    assert(nv.targetVectors == Seq("default", "rev"))
    assert(nv.combination == TargetCombination.ManualWeights(Seq(2.0, 1.0)))
    assert(nv.vectors.map { case TargetQuery.Single(v) => v.toSeq; case q => q } ==
      Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))

    assert(err(
      """{"collection": "Embedding", "limit": 10,
        |  "nearVector": {"vector": [1.0],
        |    "targets": {"targetVectors": ["default", "rev"],
        |      "combination": "COMBINATION_METHOD_TYPE_MANUAL",
        |      "weightsForTargets": [{"target": "default", "weight": 2.0}]}}}""".stripMargin)
      == "number of weights (1) does not match number of targets (2)")

    // vectorPerTarget map form
    val per = WireDecoder.search(g,
      """{"collection": "Embedding", "limit": 10,
        |  "nearVector": {
        |    "vectorPerTarget": {"default": [1.0, 0.0], "rev": [0.0, 1.0]},
        |    "targets": {"targetVectors": ["default", "rev"],
        |      "combination": "COMBINATION_METHOD_TYPE_SUM"}}}""".stripMargin)
    assert(per.nearVector.get.combination == TargetCombination.Sum)
    assert(per.nearVector.get.vectors.size == 2)
  }

  test("nearObject and nearText decode with moves; empty id errors") {
    val no = WireDecoder.search(g,
      """{"collection": "Embedding", "limit": 10, "nearObject": {"id": "7", "distance": 0.5}}""")
    assert(no.nearObject.contains(NearObject(7L, metric = Metric.Default, distance = Some(0.5))))
    assert(err("""{"collection": "Embedding", "limit": 10, "nearObject": {}}""")
      == "near_object: id is required")

    val nt = WireDecoder.search(g,
      """{"collection": "DocVec", "limit": 10,
        |  "nearText": {"query": ["spark", "stream"],
        |    "moveTo": {"concepts": ["join"], "force": 0.3},
        |    "moveAway": {"concepts": ["disk"], "force": 0.1, "uuids": ["42"]}}}""".stripMargin)
    val p = nt.nearText.get
    assert(p.concepts == Seq("spark", "stream"))
    assert(p.moveTo.contains(MoveParams(Seq("join"), 0.3)))
    assert(p.moveAwayFrom.contains(MoveParams(Seq("disk"), 0.1, objects = Seq(42L))))
  }

  test("bm25 + searchOperator and hybrid defaults/fusion/subsearch validations") {
    val b = WireDecoder.search(g,
      """{"collection": "Document", "limit": 20,
        |  "metadata": {"score": true},
        |  "properties": {"nonRefProperties": ["doc_id"]},
        |  "bm25Search": {"query": "spark join stream window", "properties": ["text"],
        |    "searchOperator": {"operator": "OPERATOR_AND"}}}""".stripMargin)
    assert(b.bm25.contains(Bm25("spark join stream window", properties = Seq("text"),
      searchOperator = SearchOperator.AndOp)))
    assert(b.additional == Set("score"))

    val h = WireDecoder.search(g,
      """{"collection": "DocVec", "limit": 15,
        |  "hybridSearch": {"query": "spark join", "alpha": 0.7,
        |    "fusionType": "FUSION_TYPE_RANKED", "vector": [0.5, 0.5]}}""".stripMargin)
    val hy = h.hybrid.get
    assert(hy.alpha == 0.7 && hy.fusionType == FusionType.Ranked)
    assert(hy.vector.get.toSeq == Seq(0.5f, 0.5f))

    // defaults: legacy alpha is the raw proto3 zero (parse_search_request
    // .go:308-310 — DefaultAlpha only applies on the use_alpha_param path),
    // relativeScore fusion
    val hd = WireDecoder.search(g,
      """{"collection": "DocVec", "limit": 15, "hybridSearch": {"query": "spark"}}""")
    assert(hd.hybrid.get.alpha == 0.0 && hd.hybrid.get.fusionType == FusionType.RelativeScore)

    assert(err(
      """{"collection": "DocVec", "limit": 15,
        |  "hybridSearch": {"query": "x", "vector": [1.0],
        |    "nearText": {"query": ["spark"]}}}""".stripMargin)
      == "cannot combine nearText and query in hybrid search")
    assert(err(
      """{"collection": "DocVec", "limit": 15,
        |  "hybridSearch": {"query": "x",
        |    "nearText": {"query": ["spark"]}, "nearVector": {"vector": [1.0]}}}""".stripMargin)
      == "cannot combine nearText and nearVector in hybrid search")
    assert(err(
      """{"collection": "DocVec", "limit": 15,
        |  "hybridSearch": {"query": "x",
        |    "nearText": {"query": ["spark"], "selection": {"mmr": {"limit": 3}}}}}""".stripMargin)
      == "hybrid: selection must be set on the top-level hybrid search, not on the near_text sub-search")
  }

  test("sort/groupBy/cursor/MMR validations replay reference errors") {
    val sorted = WireDecoder.search(g,
      """{"collection": "Part", "limit": 12, "offset": 3,
        |  "sortBy": [{"ascending": false, "path": ["p_retailprice"]}, {"ascending": true, "path": ["p_name"]}]}""".stripMargin)
    assert(sorted.sort == Seq(SortBy(Seq("p_retailprice"), desc = true), SortBy(Seq("p_name"), desc = false)))
    assert(sorted.pagination.contains(Pagination(3, 12)))

    assert(err(
      """{"collection": "Document", "limit": 5,
        |  "sortBy": [{"ascending": true, "path": ["n_chars"]}],
        |  "bm25Search": {"query": "spark"}}""".stripMargin)
      == "sorting cannot be combined with search")

    assert(err(
      """{"collection": "Document", "limit": 5,
        |  "groupBy": {"path": ["lang", "source"], "numberOfGroups": 2, "objectsPerGroup": 3}}""".stripMargin)
      == "groupby path can only have one entry, received [lang source]")

    val grouped = WireDecoder.search(g,
      """{"collection": "Document", "limit": 5,
        |  "nearText": {"query": ["spark"]},
        |  "groupBy": {"path": ["lang"], "numberOfGroups": 2, "objectsPerGroup": 3}}""".stripMargin)
    assert(grouped.groupBy.contains(GroupByParams("lang", 2, 3)))

    val cur = WireDecoder.search(g, """{"collection": "Document", "limit": 7, "after": "120"}""")
    assert(cur.cursor.contains(Cursor(Some(120L), 7)))

    assert(err(
      """{"collection": "Embedding", "limit": 10,
        |  "nearVector": {"vector": [1.0], "selection": {"mmr": {"limit": 0}}}}""".stripMargin)
      == "MMR limit must be at least 1")
    assert(err(
      """{"collection": "Embedding", "limit": 10,
        |  "nearVector": {"vector": [1.0], "selection": {"mmr": {"limit": 20, "balance": 0.5}}}}""".stripMargin)
      == "MMR limit (20) cannot be larger than the query limit (10)")
    assert(err(
      """{"collection": "Embedding", "limit": 10,
        |  "nearVector": {"vector": [1.0], "selection": {"mmr": {"limit": 3, "balance": 1.5}}}}""".stripMargin)
      == "MMR balance must be between 0 and 1")
  }

  test("default limit is 10 (QueryDefaults.Limit) when absent or zero") {
    assert(WireDecoder.search(g, """{"collection": "Document"}""")
      .pagination.contains(Pagination(0, 10)))
    assert(WireDecoder.search(g, """{"collection": "Document", "limit": 0, "offset": 2}""")
      .pagination.contains(Pagination(2, 10)))
  }

  test("aggregate request decodes the full matrix") {
    val a = WireDecoder.aggregate(g,
      """{"collection": "Lineitem", "objectsCount": true,
        |  "groupBy": {"collection": "Lineitem", "property": "l_returnflag"},
        |  "limit": 50,
        |  "filters": {"operator": "OPERATOR_GREATER_THAN", "on": ["l_quantity"], "valueNumber": 10.0},
        |  "aggregations": [
        |    {"property": "l_quantity", "number": {"count": true, "mean": true, "sum": true, "maximum": true, "minimum": true}},
        |    {"property": "l_linenumber", "int": {"median": true, "mode": true}},
        |    {"property": "l_returnflag", "text": {"count": true, "topOccurences": true, "topOccurencesLimit": 3}},
        |    {"property": "is_high", "boolean": {"totalTrue": true, "percentageFalse": true}},
        |    {"property": "l_shipdate", "date": {"maximum": true, "minimum": true}},
        |    {"property": "l_partkey", "reference": {"pointingTo": true, "type": true}}]}""".stripMargin)
    assert(a.collection == "Lineitem" && a.includeMetaCount)
    assert(a.groupBy.contains(Seq("l_returnflag")) && a.limit.contains(50))
    assert(a.where.contains(Where.gtNum("l_quantity", 10.0)))
    import Aggregator._
    assert(a.properties("l_quantity") == Seq(Count, Mean, Maximum, Minimum, Sum))
    assert(a.properties("l_linenumber") == Seq(Median, Mode))
    assert(a.properties("l_returnflag") == Seq(Count, TopOccurrences(3)))
    assert(a.properties("is_high") == Seq(TotalTrue, PercentageFalse))
    assert(a.properties("l_shipdate") == Seq(Maximum, Minimum))
    assert(a.properties("l_partkey") == Seq(Type, PointingTo))

    val e = intercept[IllegalArgumentException](WireDecoder.aggregate(g,
      """{"collection": "Embedding",
        |  "nearVector": {"vector": [1.0],
        |    "targets": {"targetVectors": ["default", "rev"]}}}""".stripMargin))
    assert(e.getMessage == "found more than one target vector for aggregation")
  }

  test("unknown collection fails before anything else, like authorizedGetClass") {
    val e = intercept[IllegalArgumentException](
      WireDecoder.search(g, """{"collection": "Ghost", "limit": 5}"""))
    assert(e.getMessage.contains("unknown collection"))
  }

  test("hybrid alpha: legacy clients without use_alpha_param get the raw proto3 default 0") {
    // parse_search_request.go:308-314 — !UseAlphaParam reads hs.Alpha
    // verbatim; proto3 omits zero scalars, so a pure-BM25 request (alpha=0)
    // arrives with the field absent and must decode as 0, NOT DefaultAlpha
    val legacy = WireDecoder.search(g,
      """{"collection": "DocVec", "limit": 5, "hybridSearch": {"query": "spark"}}""")
    assert(legacy.hybrid.map(_.alpha).contains(0.0))
    val legacyExplicit = WireDecoder.search(g,
      """{"collection": "DocVec", "limit": 5, "hybridSearch": {"query": "spark", "alpha": 0.3}}""")
    assert(legacyExplicit.hybrid.map(_.alpha).contains(0.3))
    // the new path: use_alpha_param with alpha_param absent → DefaultAlpha
    val modern = WireDecoder.search(g,
      """{"collection": "DocVec", "limit": 5, "hybridSearch": {"query": "spark", "useAlphaParam": true}}""")
    assert(modern.hybrid.map(_.alpha).contains(0.75))
  }

  test("returnAllNonrefProperties keeps the selection open even with objectProperties present") {
    // parse_search_request.go:987-996,1096 — ReturnAll already includes the
    // object props; here Nil = "all", so objProps must not narrow it
    val all = WireDecoder.search(g,
      """{"collection": "Document", "limit": 5,
        |  "properties": {"returnAllNonrefProperties": true,
        |    "objectProperties": [{"propName": "title"}]}}""".stripMargin)
    assert(all.properties.isEmpty)
    // without returnAll, objectProperties join the explicit selection
    val some = WireDecoder.search(g,
      """{"collection": "Document", "limit": 5,
        |  "properties": {"nonRefProperties": ["lang"],
        |    "objectProperties": [{"propName": "title"}]}}""".stripMargin)
    assert(some.properties == Seq("lang", "title"))
  }

  test("tenants wire: alias fold, create/update FROZEN split, empty-on-create default") {
    val created = WireDecoder.decodeTenants(
      """[{"name": "a", "activityStatus": "HOT"},
        |  {"name": "b", "activityStatus": "INACTIVE"},
        |  {"name": "c"}]""".stripMargin, forCreate = true)
    assert(created == Seq(
      Tenant("a", TenantStatus.Active),
      Tenant("b", TenantStatus.Inactive),
      Tenant("c", TenantStatus.Active)))
    // FROZEN/OFFLOADED is an update-only status (tenant.go allowFrozen)
    val updated = WireDecoder.decodeTenants(
      """[{"name": "a", "activityStatus": "FROZEN"}]""", forCreate = false)
    assert(updated == Seq(Tenant("a", TenantStatus.Offloaded)))
    val e = intercept[IllegalArgumentException](WireDecoder.decodeTenants(
      """[{"name": "a", "activityStatus": "OFFLOADED"}]""", forCreate = true))
    assert(e.getMessage == """invalid activity status 'FROZEN' for tenant "a"""")
  }
}
