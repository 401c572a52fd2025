package graft

import graft.engine.{Graft, GraphQL, WireDecoder}
import graft.model._

/**
 * GraphQL wire-decoder parity: a GraphQL query document decodes to EXACTLY
 * the GetParams/AggregateParams a programmatic caller builds, and malformed
 * arguments replay the reference's extraction-layer validation errors
 * verbatim (adapters/handlers/graphql/local/get/class_builder_fields.go,
 * local/common_filters, local/aggregate/resolver.go).
 */
class GraphQLSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val g: Graft = Fixtures.graft(spark, sf)

  private def getErr(doc: String): String =
    intercept[IllegalArgumentException](GraphQL.get(g, doc)).getMessage
  private def aggErr(doc: String): String =
    intercept[IllegalArgumentException](GraphQL.aggregate(g, doc)).getMessage

  // --------------------------------------------------------------------------
  // parser
  // --------------------------------------------------------------------------

  test("parser: comments, commas-as-whitespace, query header, escapes") {
    val params = GraphQL.get(g,
      """# leading comment
        |query NamedOp {
        |  Get {
        |    Lineitem(limit: 7, offset: 2, where: {
        |      operator: Equal, path: ["l_returnflag"], valueText: "R\n\"qA"
        |    }) { l_orderkey, l_linenumber }
        |  }
        |}""".stripMargin)
    assert(params.collection == "Lineitem")
    assert(params.pagination.contains(Pagination(offset = 2, limit = 7)))
    assert(params.properties == Seq("l_orderkey", "l_linenumber"))
    assert(params.where.contains(Where.eqText("l_returnflag", "R\n\"qA")))
  }

  test("decoder hardening: every malformed input stays inside the WireError contract") {
    // bare '-' and digitless exponents are parse errors, not NumberFormatException
    assert(getErr("{ Get { Lineitem(limit: -) { l_orderkey } } }")
      .contains("malformed number '-'"))
    assert(getErr("""{ Get { Lineitem(where: {operator: Equal, path: ["x"], valueNumber: 1e}) { l_orderkey } } }""")
      .contains("malformed number '1e'"))
    // built via concat: scalac pre-processes \-u escapes even in raw strings
    assert(getErr("""{ Get { Document(bm25: {query: """" + "\\" + "uZZZZ" + """"}) { doc_id } } }""")
      .contains("bad \\u escape 'ZZZZ'"))
    // empty vectorPerTarget cannot reach entries.head
    assert(getErr("""{ Get { Embedding(nearVector: {vectorPerTarget: {}}) { vec_id } } }""")
      == "failed to extract nearVector params: vectorPerTarget must contain at least one target vector")
    // get() refuses to silently drop a decoded legacy group argument
    assert(getErr("""{ Get { Embedding(group: {type: merge, force: 1.0}, limit: 10) { vec_id } } }""")
      .contains("needs GraphQL.getFull"))
    // groupBy list with a non-string element keeps its element error
    assert(aggErr("{ Aggregate { Document(groupBy: [5]) { meta { count } } } }")
      == "could not extract groupBy path: path segment must be a string, got 5")
  }

  test("parser: rejects mutations and trailing content") {
    // (variables and aliases are SUPPORTED since round 13 — see the
    // dedicated tests below; a nullable declared variable with no value
    // resolves to null, so a limit stays default rather than erroring)
    assert(getErr("mutation { Get { Lineitem { l_orderkey } } }")
      .contains("unsupported operation type 'mutation'"))
    assert(getErr("{ Get { Lineitem { l_orderkey } } } {}").contains("unexpected content"))
  }

  // --------------------------------------------------------------------------
  // Get: where / sort / pagination / selection
  // --------------------------------------------------------------------------

  test("get: where tree + sort + limit matches the programmatic twin") {
    val decoded = GraphQL.get(g,
      """{ Get { Lineitem(
        |    where: {operator: And, operands: [
        |      {operator: Equal, path: ["l_returnflag"], valueText: "R"},
        |      {operator: GreaterThan, path: ["l_quantity"], valueNumber: 30.0},
        |      {operator: LessThan, path: ["l_shipdate"], valueDate: "1995-06-17"}]},
        |    sort: [{path: ["l_orderkey"], order: asc}, {path: ["l_linenumber"], order: desc}],
        |    limit: 100000
        |  ) { l_orderkey l_linenumber } } }""".stripMargin)
    val twin = GetParams("Lineitem",
      where = Some(Where.and(
        Where.eqText("l_returnflag", "R"),
        Where.gtNum("l_quantity", 30.0),
        Where.ltDate("l_shipdate", "1995-06-17"))),
      sort = Seq(SortBy(Seq("l_orderkey")), SortBy(Seq("l_linenumber"), desc = true)),
      properties = Seq("l_orderkey", "l_linenumber"),
      pagination = Some(Pagination(0, 100000)))
    assert(decoded == twin)
  }

  test("get: GraphQL where equals the REST filterext tree decode") {
    val gql = GraphQL.get(g,
      """{ Get { Document(where: {operator: Or, operands: [
        |  {operator: ContainsAny, path: ["lang"], valueText: ["en", "de"]},
        |  {operator: IsNull, path: ["maybe_src"], valueBoolean: true}]}, limit: 5)
        |  { doc_id } } }""".stripMargin).where.get
    val rest = WireDecoder.restWhere(g, "Document",
      """{"operator": "Or", "operands": [
        |  {"operator": "ContainsAny", "path": ["lang"], "valueTextArray": ["en", "de"]},
        |  {"operator": "IsNull", "path": ["maybe_src"], "valueBoolean": true}]}""".stripMargin)
    assert(gql == rest)
  }

  test("get: where errors carry the resolver's could-not-extract wrapping") {
    // filterext.Parse per-level error under the resolveGet wrap
    assert(getErr("""{ Get { Lineitem(where: {operator: And, operands: []}) { l_orderkey } } }""")
      == "could not extract filters: invalid where filter: operator 'And', but no operands set - add at least one operand")
    // filterMapToModel type error: double wrap, Go %T name
    assert(getErr("""{ Get { Lineitem(where: {operator: Equal, path: ["l_orderkey"], valueInt: true}) { l_orderkey } } }""")
      == "could not extract filters: failed to extract filters: unsupported type: 'bool'")
    assert(getErr("""{ Get { Lineitem(where: {operator: Equal, path: ["l_returnflag"], valueText: 3}) { l_orderkey } } }""")
      == "could not extract filters: failed to extract filters: unsupported type: 'float64'")
  }

  test("get: scalar-or-list value folding (valueText list = ContainsAny array)") {
    val decoded = GraphQL.get(g,
      """{ Get { Lineitem(where: {operator: ContainsAll, path: ["l_returnflag"],
        |  valueText: ["R"]}, limit: 3) { l_orderkey } } }""".stripMargin)
    assert(decoded.where.contains(
      Where(WhereOp.ContainsAll, Seq("l_returnflag"),
        Some(FilterValue.ListV(Seq(FilterValue.TextV("R")))))))
  }

  test("get: geo where uses the GraphQL geoCoordinates/distance.max shape") {
    val decoded = GraphQL.get(g,
      """{ Get { Customer(where: {operator: WithinGeoRange, path: ["geo"],
        |  valueGeoRange: {geoCoordinates: {latitude: 48.5, longitude: 9.2}, distance: {max: 500000.0}}},
        |  limit: 9) { c_name } } }""".stripMargin)
    assert(decoded.where.contains(
      Where(WhereOp.WithinGeoRange, Seq("geo"),
        Some(FilterValue.GeoRangeV(48.5, 9.2, 500000.0)))))
  }

  test("get: selection set maps props, refs, _additional; cursor/autocut/tenant args") {
    val full = GraphQL.getFull(g,
      """{ Get { Order(after: "500", autocut: 2, limit: 30,
        |    group: {type: closest, force: 0.35}) {
        |  o_orderkey
        |  o_custkey { ... on Customer { c_name c_acctbal } }
        |  _additional { id distance vector creationTimeUnix }
        |} } }""".stripMargin)
    val p = full.params
    assert(p.properties == Seq("o_orderkey", "o_custkey"))
    assert(p.resolveRefs == Seq("o_custkey"))
    assert(p.additional == Set("id", "distance", "vector", "creationTimeUnix"))
    assert(p.cursor.contains(Cursor(Some(500L), 30)))
    assert(p.autocut.contains(2))
    assert(full.group.contains(GraphQL.GqlGroup("closest", 0.35)))
  }

  test("get: _additional module fields decode to rerank/generate/featureProjection params") {
    val p = GraphQL.get(g,
      """{ Get { Document(limit: 4) {
        |  doc_id
        |  _additional {
        |    rerank(property: "text", query: "spark") { score }
        |    generate(singleResult: {prompt: "Summarize {text}"}) { singleResult }
        |    featureProjection(dimensions: 2) { vector }
        |  }
        |} } }""".stripMargin)
    assert(p.rerank.contains(RerankParams("text", "spark")))
    assert(p.generate.contains(GenerateParams(singlePrompt = Some("Summarize {text}"))))
    assert(p.featureProjection.contains(FeatureProjectionParams(dimensions = 2)))
    assert(getErr("{ Get { Document { _additional { bogusField } } } }")
      .contains("unknown _additional property 'bogusField'"))
  }

  // --------------------------------------------------------------------------
  // near legs
  // --------------------------------------------------------------------------

  test("nearVector: vector + targets + weights; reference error arms verbatim") {
    val p = GraphQL.get(g,
      """{ Get { Embedding(limit: 10, nearVector: {
        |  vector: [0.1, 0.2, 0.3],
        |  targets: {targetVectors: ["default", "rev"], combinationMethod: manualWeights,
        |            weights: {default: 0.7, rev: 0.3}}
        |}) { vec_id _additional { distance } } } }""".stripMargin)
    val nv = p.nearVector.get
    assert(nv.vector.toSeq == Seq(0.1f, 0.2f, 0.3f))
    assert(nv.targetVectors == Seq("default", "rev"))
    assert(nv.combination == TargetCombination.ManualWeights(Seq(0.7, 0.3)))

    assert(getErr("""{ Get { Embedding(nearVector: {certainty: 0.9}) { vec_id } } }""")
      == "failed to extract nearVector params: vector or vectorPerTarget is required field")
    assert(getErr("""{ Get { Embedding(nearVector: {vector: [0.1], certainty: 0.9, distance: 0.2}) { vec_id } } }""")
      == "failed to extract nearVector params: cannot provide distance and certainty")
    assert(getErr(
      """{ Get { Embedding(nearVector: {vector: [0.1],
        |  targets: {targetVectors: ["default", "rev"], combinationMethod: manualWeights,
        |            weights: {default: 0.7}}}) { vec_id } } }""".stripMargin)
      == "failed to extract nearVector params: weight for target rev is not provided")
    assert(getErr(
      """{ Get { Embedding(nearVector: {vector: [0.1], targets: {combinationMethod: sum}}) { vec_id } } }""")
      == "failed to extract nearVector params: targetVectors is required field, got map[combinationMethod:sum]")
  }

  test("nearObject/nearText: beacon ids, moves, autocorrect") {
    val p = GraphQL.get(g,
      """{ Get { Embedding(limit: 10,
        |  nearObject: {beacon: "weaviate://localhost/Embedding/7", distance: 0.4})
        |  { vec_id } } }""".stripMargin)
    assert(p.nearObject.contains(
      NearObject(7L, metric = Metric.Default, distance = Some(0.4))))

    val nt = GraphQL.get(g,
      """{ Get { DocVec(limit: 5, nearText: {
        |  concepts: ["stream", "window"],
        |  moveTo: {concepts: ["join"], force: 0.5, objects: [{id: "3"}]},
        |  moveAwayFrom: {concepts: ["batch"], force: 0.25}
        |}) { doc_id } } }""".stripMargin).nearText.get
    assert(nt.concepts == Seq("stream", "window"))
    assert(nt.moveTo.contains(MoveParams(Seq("join"), 0.5, objects = Seq(3L))))
    assert(nt.moveAwayFrom.contains(MoveParams(Seq("batch"), 0.25)))

    assert(getErr("""{ Get { Embedding(nearObject: {distance: 0.4}) { vec_id } } }""")
      == "failed to extract nearObject params: nearObject params: empty id and beacon")
  }

  // --------------------------------------------------------------------------
  // bm25 / hybrid
  // --------------------------------------------------------------------------

  test("bm25: query/properties/searchOperator; sort incompatibility is verbatim") {
    val p = GraphQL.get(g,
      """{ Get { Document(limit: 20, bm25: {query: "spark join", properties: ["text"],
        |  searchOperator: {operator: And}}) { doc_id _additional { score } } } }""".stripMargin)
    assert(p.bm25.contains(Bm25("spark join", Seq("text"), SearchOperator.AndOp)))
    assert(p.additional == Set("score"))

    assert(getErr(
      """{ Get { Document(bm25: {query: "x"}, sort: [{path: ["doc_id"], order: asc}]) { doc_id } } }""")
      == "bm25 search is not compatible with sort")
    assert(getErr(
      """{ Get { Document(hybrid: {query: "x"}, sort: [{path: ["doc_id"], order: asc}]) { doc_id } } }""")
      == "hybrid search is not compatible with sort")
  }

  test("hybrid: alpha/fusion/vector decode; defaults match the reference") {
    val h = GraphQL.get(g,
      """{ Get { DocVec(limit: 15, hybrid: {query: "spark join stream",
        |  alpha: 0.7, fusionType: rankedFusion, vector: [0.5, 0.5, 0.5]})
        |  { doc_id _additional { score } } } }""".stripMargin).hybrid.get
    assert(h.alpha == 0.7 && h.fusionType == FusionType.Ranked)
    assert(h.vector.get.toSeq == Seq(0.5f, 0.5f, 0.5f))

    // defaults: alpha 0.75, relativeScoreFusion (common_filters/hybrid.go:23,28)
    val d = GraphQL.get(g, """{ Get { DocVec(hybrid: {query: "x"}) { doc_id } } }""").hybrid.get
    assert(d.alpha == 0.75 && d.fusionType == FusionType.RelativeScore)
  }

  test("hybrid: searches.nearVector folds into the dense leg; operands become subsearches") {
    val h = GraphQL.get(g,
      """{ Get { DocVec(limit: 15, hybrid: {query: "spark",
        |  searches: [{nearVector: {vector: [0.5, 0.25, 0.25], distance: 0.6}}]})
        |  { doc_id } } }""".stripMargin).hybrid.get
    assert(h.vector.get.toSeq == Seq(0.5f, 0.25f, 0.25f))
    assert(h.maxVectorDistance.contains(0.6))

    val sub = GraphQL.get(g,
      """{ Get { DocVec(limit: 15, hybrid: {operands: [
        |  {weight: 0.6, sparseSearch: {query: "spark join"}},
        |  {weight: 0.4, nearText: {concepts: ["stream"]}}]})
        |  { doc_id } } }""".stripMargin).hybrid.get
    assert(sub.subSearches.size == 2)
    assert(sub.subSearches(0) == HybridSubSearch(0.6, bm25 = Some(Bm25("spark join"))))
    assert(sub.subSearches(1).weight == 0.4 && sub.subSearches(1).nearText.get.concepts == Seq("stream"))
  }

  test("hybrid: reference error arms verbatim") {
    def hybridErr(args: String): String =
      getErr(s"""{ Get { DocVec(hybrid: {$args}) { doc_id } } }""")
    assert(hybridErr("query: \"x\", alpha: 1.5")
      == "failed to extract hybrid params: alpha should be between 0.0 and 1.0")
    assert(hybridErr(
      """query: "x", searches: [{nearText: {concepts: ["a"]}}], vector: [0.1]""")
      == "failed to extract hybrid params: cannot have both vector and nearTextParams")
    assert(hybridErr(
      """query: "x", searches: [{nearVector: {vector: [0.1]}}], vector: [0.1]""")
      == "failed to extract hybrid params: cannot have both vector and nearVectorParams")
    assert(hybridErr(
      """query: "x", searches: [{nearText: {concepts: ["a"]}, nearVector: {vector: [0.1]}}]""")
      == "failed to extract hybrid params: hybrid search cannot have both nearText and nearVector parameters")
    assert(hybridErr(
      """query: "x", searches: [{nearVector: {vector: [0.1], targets: {targetVectors: ["default"]}}}]""")
      == "failed to extract hybrid params: targetVectors need to be set in the hybrid search to be handled correctly")
    assert(hybridErr("""query: "x", operands: [{weight: 0.5, somethingElse: {q: 1}}]""")
      == "failed to extract hybrid params: unknown subsearch type: map[somethingElse:map[q:1] weight:0.5]")
    assert(hybridErr(
      """query: "x", searches: [{nearText: {concepts: ["a"], autocorrect: true}}]""")
      == "failed to extract hybrid params: autocorrect is not supported for hybrid nearText")
  }

  // --------------------------------------------------------------------------
  // Explore
  // --------------------------------------------------------------------------

  test("explore: nearText args decode; certainty is selection-driven") {
    val e = GraphQL.explore(
      """{ Explore(limit: 12, offset: 3, nearText: {
        |    concepts: ["spark join"], moveTo: {concepts: ["window"], force: 0.6}})
        |  { beacon className distance certainty } }""".stripMargin)
    assert(e.limit == 12 && e.offset == 3 && e.withCertainty)
    assert(e.nearText.get.concepts == Seq("spark join"))
    assert(e.nearText.get.moveTo.contains(MoveParams(Seq("window"), 0.6)))
    val noCert = GraphQL.explore(
      """{ Explore(nearVector: {vector: [0.5, 0.5]}) { beacon distance } }""")
    assert(!noCert.withCertainty && noCert.nearVector.get.vector.toSeq == Seq(0.5f, 0.5f))
    assert(intercept[IllegalArgumentException](GraphQL.explore(
      "{ Get { Doc { x } } }")).getMessage == "graphql: expected an Explore query, got 'Get'")
  }

  // --------------------------------------------------------------------------
  // Aggregate
  // --------------------------------------------------------------------------

  test("aggregate: selection-set aggregators + groupBy + meta match the programmatic twin") {
    val decoded = GraphQL.aggregate(g,
      """{ Aggregate { Order(groupBy: ["o_orderstatus"]) {
        |  groupedBy { value }
        |  meta { count }
        |  o_totalprice { count sum mean minimum maximum }
        |} } }""".stripMargin)
    val twin = AggregateParams("Order",
      groupBy = Some(Seq("o_orderstatus")),
      properties = Map("o_totalprice" -> Seq(Aggregator.Count, Aggregator.Sum,
        Aggregator.Mean, Aggregator.Minimum, Aggregator.Maximum)),
      includeMetaCount = true)
    assert(decoded == twin)
  }

  test("aggregate: topOccurrences default limit 5, limit arg override, pointingTo") {
    val p = GraphQL.aggregate(g,
      """{ Aggregate { Document {
        |  lang { topOccurrences { value occurs } }
        |  links { pointingTo type }
        |} } }""".stripMargin)
    assert(p.properties("lang") == Seq(Aggregator.TopOccurrences(5)))
    assert(p.properties("links") == Seq(Aggregator.PointingTo, Aggregator.Type))
    val capped = GraphQL.aggregate(g,
      """{ Aggregate { Document { lang { topOccurrences(limit: 3) { value occurs } } } } }""")
    assert(capped.properties("lang") == Seq(Aggregator.TopOccurrences(3)))
  }

  test("aggregate: first-letter lowercasing quirk and error arms") {
    // resolver.go:222 lowercases the first letter of the selection name
    val p = GraphQL.aggregate(g, "{ Aggregate { Document { Lang { count } } } }")
    assert(p.properties.contains("lang"))

    assert(aggErr("{ Aggregate { Document { lang { bogus } } } }")
      == "could not extract properties for class 'Document': unrecognized aggregator prop 'bogus'")
    assert(aggErr("{ Aggregate { Document(objectLimit: 0) { meta { count } } } }")
      == "objectLimit must be a positive integer")
    assert(aggErr("{ Aggregate { Document(objectLimit: 5) { meta { count } } } }")
      == "objectLimit can only be used with a near<Media> or hybrid filter")
    assert(aggErr("""{ Aggregate { Document(groupBy: ["links", "Document"]) { meta { count } } } }""")
      == "could not extract groupBy path: missing an argument after 'Document'")
  }

  test("variables: typed substitution, defaults, enum coercion, error texts") {
    // variable-driven document decodes to the same params as the inline twin
    val viaVars = GraphQL.get(g,
      """query Q($flag: String!, $qty: Float!, $lim: Int = 100000) {
        |  Get { Lineitem(
        |    where: {operator: And, operands: [
        |      {operator: Equal, path: ["l_returnflag"], valueText: $flag},
        |      {operator: GreaterThan, path: ["l_quantity"], valueNumber: $qty}]},
        |    limit: $lim) { l_orderkey } } }""".stripMargin,
      """{"flag": "R", "qty": 30.0}""")
    val inline = GraphQL.get(g,
      """{ Get { Lineitem(
        |    where: {operator: And, operands: [
        |      {operator: Equal, path: ["l_returnflag"], valueText: "R"},
        |      {operator: GreaterThan, path: ["l_quantity"], valueNumber: 30.0}]},
        |    limit: 100000) { l_orderkey } } }""".stripMargin)
    assert(viaVars == inline)
    // string variable coerces to an enum when the declared type is not scalar
    val sorted = GraphQL.get(g,
      """query S($o: SortOrder!) {
        |  Get { Part(sort: [{path: ["p_size"], order: $o}], limit: 1) { p_partkey } } }""".stripMargin,
      """{"o": "desc"}""")
    assert(sorted.sort.head.desc)
    // graphql-go error texts
    val missing = intercept[Exception](GraphQL.get(g,
      """query R($lim: Int!) { Get { Region(limit: $lim) { r_name } } }""", "{}"))
    assert(missing.getMessage == """Variable "$lim" of required type "Int!" was not provided.""")
    val undeclared = intercept[Exception](GraphQL.get(g,
      """{ Get { Region(limit: $lim) { r_name } } }""", """{"lim": 1}"""))
    assert(undeclared.getMessage == """Variable "$lim" is not defined.""")
  }

  test("aliases: reply-key renames for props, refs and aggregate selections") {
    val full = GraphQL.getFull(g,
      """{ Get { Lineitem(limit: 1) { k: l_orderkey l_linenumber q: l_quantity } } }""")
    assert(full.params.properties == Seq("l_orderkey", "l_linenumber", "l_quantity"))
    assert(full.aliases == Seq("k" -> "l_orderkey", "q" -> "l_quantity"))
    val fa = GraphQL.aggregateFull(g,
      """{ Aggregate { Document { n: n_chars { count maximum } } } }""")
    assert(fa.params.properties("n_chars").toSet ==
      Set(Aggregator.Count, Aggregator.Maximum))
    assert(fa.aliases.toSet ==
      Set("n_count" -> "n_chars_count", "n_maximum" -> "n_chars_maximum"))
  }
}
