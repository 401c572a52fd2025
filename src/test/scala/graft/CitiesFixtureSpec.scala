package graft

import org.apache.spark.sql.functions._

import graft.engine.GraphQL
import graft.model._

/**
 * The cities acceptance bed: replays of the reference's own GraphQL
 * acceptance documents (test/acceptance/graphql_resolvers) against the
 * CitiesFixture rebuild of its sample data, asserting the REFERENCE'S OWN
 * expected outputs (the exact name orders / sets its Go tests assert).
 * The q_fixture_* gates hash the same replays against VALUES oracles; this
 * spec is the fast in-build twin with the first-principles assertions.
 */
class CitiesFixtureSpec extends SparkSpecBase {

  private lazy val g = CitiesFixture.graft(spark)

  private def names(doc: String): Seq[String] =
    g.get(GraphQL.get(g, doc)).select(col("name")).collect()
      .map(r => if (r.isNullAt(0)) "∅" else r.getString(0)).toSeq

  test("uuid-ordered paging (local_get_test.go:122-178)") {
    assert(names("{ Get { City { name } } }") ==
      Seq("Rotterdam", "Dusseldorf", "Missing Island", "∅", "Amsterdam", "Berlin"))
    assert(names("{ Get { City(limit: 2) { name } } }") == Seq("Rotterdam", "Dusseldorf"))
    assert(names("{ Get { City(offset: 2 limit: 2) { name } } }") == Seq("Missing Island", "∅"))
    assert(names("{ Get { City(offset: 2) { name } } }") ==
      Seq("Missing Island", "∅", "Amsterdam", "Berlin"))
    assert(names("{ Get { City(offset: 5 limit: 10) { name } } }") == Seq("Berlin"))
    assert(names("{ Get { City(offset: 6) { name } } }") == Seq.empty)
  }

  test("relations resolve through the cref (local_get_test.go:86-100)") {
    val page = g.get(GraphQL.get(g,
      "{ Get { City { name, inCountry { ... on Country { name } } } } }"))
      .select(col("name"), expr("transform(inCountry_resolved, x -> x.name)"))
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("∅"),
        Option(r.getSeq[String](1))
          .map(_.mkString("[", "|", "]")).getOrElse("∅")))
    assert(page.toSeq == Seq(
      ("Rotterdam", "[Netherlands]"), ("Dusseldorf", "[Germany]"),
      ("Missing Island", "∅"), ("∅", "∅"),
      ("Amsterdam", "[Netherlands]"), ("Berlin", "[Germany]")),
      "ref-expanded pages keep uuid order")
  }

  test("simple sorts match the acceptance orders (local_get_with_sort_test.go:38-328)") {
    def sorted(prop: String, order: String): Seq[String] =
      names(s"""{ Get { City(sort: [{path: ["$prop"] order: $order}]) { name } } }""")
    assert(sorted("name", "asc") ==
      Seq("∅", "Amsterdam", "Berlin", "Dusseldorf", "Missing Island", "Rotterdam"))
    assert(sorted("name", "desc") ==
      Seq("Rotterdam", "Missing Island", "Dusseldorf", "Berlin", "Amsterdam", "∅"))
    assert(sorted("population", "asc") ==
      Seq("∅", "Missing Island", "Rotterdam", "Dusseldorf", "Amsterdam", "Berlin"))
    assert(sorted("isCapital", "asc") ==
      Seq("∅", "Rotterdam", "Dusseldorf", "Missing Island", "Amsterdam", "Berlin"))
    assert(sorted("cityArea", "desc") ==
      Seq("Berlin", "Amsterdam", "Rotterdam", "Dusseldorf", "Missing Island", "∅"))
    assert(sorted("cityRights", "asc") ==
      Seq("Missing Island", "∅", "Dusseldorf", "Rotterdam", "Amsterdam", "Berlin"))
    assert(sorted("timezones", "desc") ==
      Seq("Rotterdam", "Dusseldorf", "Amsterdam", "Berlin", "Missing Island", "∅"))
    assert(sorted("museums", "asc") ==
      Seq("Missing Island", "∅", "Berlin", "Rotterdam", "Dusseldorf", "Amsterdam"))
    assert(sorted("history", "desc") ==
      Seq("Dusseldorf", "Berlin", "Rotterdam", "Amsterdam", "Missing Island", "∅"))
    // phone sorts [countryCode, national]; geo sorts [lon, lat]
    assert(sorted("phoneNumber", "asc") ==
      Seq("Missing Island", "∅", "Rotterdam", "Dusseldorf", "Berlin", "Amsterdam"))
    assert(sorted("location", "asc") ==
      Seq("Rotterdam", "∅", "Berlin", "Missing Island", "Amsterdam", "Dusseldorf"))
    assert(sorted("location", "desc") ==
      Seq("Dusseldorf", "Amsterdam", "Missing Island", "Rotterdam", "∅", "Berlin"))
  }

  test("complex sorts (local_get_with_sort_test.go:330-581)") {
    def sorted(doc: String): Seq[String] = names(doc)
    assert(sorted("""{ Get { City(sort:[{path:["population"] order:asc},{path:["name"] order:asc}]) { name } } }""") ==
      Seq("∅", "Missing Island", "Dusseldorf", "Rotterdam", "Amsterdam", "Berlin"))
    assert(sorted("""{ Get { City(sort:[{path:["phoneNumber"] order:asc},{path:["population"] order:asc},{path:["name"] order:asc}]) { name } } }""") ==
      Seq("∅", "Missing Island", "Rotterdam", "Dusseldorf", "Berlin", "Amsterdam"))
    assert(sorted("""{ Get { City(sort:[{path:["isCapital"] order:asc},{path:["population"] order:desc},{path:["name"] order:asc}]) { name } } }""") ==
      Seq("∅", "Dusseldorf", "Rotterdam", "Missing Island", "Berlin", "Amsterdam"))
    // with limit 4 (the acceptance suite re-runs every case limited)
    assert(sorted("""{ Get { City(limit: 4 sort:[{path:["isCapital"] order:desc},{path:["timezones"] order:asc},{path:["cityRights"] order:asc},{path:["name"] order:desc}]) { name } } }""") ==
      Seq("Berlin", "Amsterdam", "Missing Island", "Dusseldorf"))
    assert(sorted("""{ Get { City(sort:[{path:["isCapital"] order:asc},{path:["timezones"] order:asc},{path:["cityRights"] order:asc},{path:["name"] order:asc}]) { name } } }""") ==
      Seq("∅", "Missing Island", "Dusseldorf", "Rotterdam", "Amsterdam", "Berlin"))
  }

  test("sort with where on id alias (local_get_with_sort_test.go:583-658)") {
    assert(names(
      """{ Get { City(sort: [{path: ["location"] order: asc}]
        |  where: {operator: Or, operands: [
        |    {valueText: "6ffb03f8-a853-4ec5-a5d8-302e45aaaf13", path: ["id"], operator: Equal},
        |    {valueText: "823abeca-eef3-41c7-b587-7a6977b08003", path: ["id"], operator: Equal}]}
        |) { name } } }""".stripMargin) == Seq("Missing Island", "Dusseldorf"))
    assert(names(
      """{ Get { City(sort: [{path: ["location"] order: asc}]
        |  where: {valueText: "non-existent-uuid", path: ["id"], operator: Equal}) { name } } }""".stripMargin)
      == Seq.empty)
  }

  test("nearText radius sets match the contextionary thresholds (sort_test.go:660-1134)") {
    // "Berlin" within 0.6: all but Missing Island
    assert(names(
      """{ Get { City(nearText: {concepts: ["Berlin"] distance: 0.6}
        |  sort: [{path: ["name"] order: asc}]) { name } } }""".stripMargin) ==
      Seq("∅", "Amsterdam", "Berlin", "Dusseldorf", "Rotterdam"))
    // certainty 0.7 = the same set
    assert(names(
      """{ Get { City(nearText: {concepts: ["Berlin"] certainty: 0.7}
        |  sort: [{path: ["population"] order: desc}]) { name } } }""".stripMargin) ==
      Seq("Berlin", "Amsterdam", "Dusseldorf", "Rotterdam", "∅"))
    // limit 2 bounds the SEARCH page (top-2 by distance: Berlin, Amsterdam)
    // BEFORE the sort reorders it — sort_test.go:830-976 pins this pipeline
    assert(names(
      """{ Get { City(nearText: {concepts: ["Berlin"] distance: 0.6}
        |  sort: [{path: ["name"] order: asc}] limit: 2) { name } } }""".stripMargin) ==
      Seq("Amsterdam", "Berlin"))
    assert(names(
      """{ Get { City(nearText: {concepts: ["Berlin"] certainty: 0.7}
        |  sort: [{path: ["population"] order: asc}] limit: 2) { name } } }""".stripMargin) ==
      Seq("Amsterdam", "Berlin"))
    // population ties among the radius page break by SEARCH RANK
    // (Dusseldorf nearer "Berlin" than Rotterdam), sort_test.go:708-719
    assert(names(
      """{ Get { City(nearText: {concepts: ["Berlin"] distance: 0.6}
        |  sort: [{path: ["population"] order: asc}]) { name } } }""".stripMargin) ==
      Seq("∅", "Dusseldorf", "Rotterdam", "Amsterdam", "Berlin"))
    // where isCapital + "Amsterdam" within 0.6, limit 2
    assert(names(
      """{ Get { City(where: {valueBoolean: true, operator: Equal, path: ["isCapital"]}
        |  nearText: {concepts: ["Amsterdam"] distance: 0.6}
        |  sort: [{path: ["name"] order: asc}] limit: 2) { name } } }""".stripMargin) ==
      Seq("Amsterdam", "Berlin"))
  }

  test("filter replays (local_get_with_filter_test.go)") {
    // nearText "hi" 0.9 + len(name) >= 0 → 5 (null name has no length entry)
    assert(names(
      """{ Get { City(nearText: {concepts: ["hi"], distance: 0.9},
        |  where: {path: "len(name)" operator: GreaterThanEqual valueInt: 0}) { name } } }""".stripMargin)
      .size == 5)
    // nearText + IsNull name → exactly the null-named city
    assert(names(
      """{ Get { City(nearText: {concepts: ["hi"], distance: 0.9},
        |  where: {path: "name" operator: IsNull valueBoolean: true}) { name } } }""".stripMargin)
      == Seq("∅"))
    // 2-hop ref filter
    val airports = g.get(GraphQL.get(g,
      """{ Get { Airport(where:{operator:And operands: [
        |  {operator: GreaterThan, valueInt: 600000, path:["inCity", "City", "population"]},
        |  {operator: Equal, valueText:"Germany", path:["inCity", "City", "inCountry", "Country", "name"]}]})
        |  { code } } }""".stripMargin)).select(col("code")).collect().map(_.getString(0))
    assert(airports.toSeq == Seq("40000"))
    // phone through a ref filter (gh-1088)
    val phone = g.get(GraphQL.get(g,
      """{ Get { Airport(where:{valueText:"Amsterdam", operator:Equal,
        |  path:["inCity", "City", "name"]}) { phone } } }""".stripMargin))
      .select(col("phone.internationalFormatted"), col("phone.countryCode"),
        col("phone.nationalFormatted")).collect()
    assert(phone.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("+31 1234567", 31L, "1234567")))
    // uuid-typed prop range filters
    val uu = g.get(GraphQL.get(g,
      """{ Get { Airport(where:{operator:And operands: [
        |  {operator: GreaterThan, valueText: "00000000-0000-0000-0000-000000010000", path:["airportId"]},
        |  {operator: LessThan, valueText: "00000000-0000-0000-0000-000000030000", path:["airportId"]},
        |  {operator: NotEqual, valueText: "00000000-0000-0000-0000-000000040000", path:["airportId"]}]})
        |  { code airportId } } }""".stripMargin)).select(col("code")).collect().map(_.getString(0))
    assert(uu.toSeq == Seq("20000"))
    // IsNull(history) both ways
    assert(names(
      """{ Get { City(where:{valueBoolean: true, operator:IsNull, path:["history"]}) { name } } }""")
      == Seq("Missing Island", "∅"))
    assert(names(
      """{ Get { City(where:{valueBoolean: false, operator:IsNull, path:["history"]}) { name } } }""")
      == Seq("Rotterdam", "Dusseldorf", "Amsterdam", "Berlin"))
  }

  test("timestamp metadata filters in ms (filter_test.go:517-652)") {
    val ms = CitiesFixture.createdMs(CitiesFixture.Airport1)
    val byText = g.get(GraphQL.get(g,
      s"""{ Get { Airport(where: {path: ["_creationTimeUnix"] operator: Equal
         |  valueText: "$ms"}) { _additional { id } } } }""".stripMargin))
    assert(byText.select(col("_id")).collect().map(_.getString(0)).toSeq ==
      Seq(CitiesFixture.Airport1))
    val date = java.time.Instant.ofEpochMilli(ms).toString
    val byDate = g.get(GraphQL.get(g,
      s"""{ Get { Airport(where: {path: ["_creationTimeUnix"] operator: GreaterThanEqual
         |  valueDate: "$date"}) { _additional { id } } } }""".stripMargin))
    assert(byDate.count() >= 1)
  }

  test("geo range replays show float32 renders (geo_range_filter_test.go)") {
    def geo(lat: Double, lon: Double, meters: Double): Seq[(String, String, String)] =
      g.get(GraphQL.get(g,
        s"""{ Get { City(where:{operator: WithinGeoRange path: ["location"]
           |  valueGeoRange: { geoCoordinates: {latitude: $lat, longitude: $lon}
           |                   distance: { max: $meters } }}) { name location } } }""".stripMargin))
        .select(col("name"), col("location.lat"), col("location.lon")).collect()
        .map(r => (r.getString(0), r.getFloat(1).toString, r.getFloat(2).toString)).toSeq
    assert(geo(51.225556, 6.782778, 100000) ==
      Seq(("Dusseldorf", "51.225555", "6.782778")))
    assert(geo(51.225556, 6.782778, 200000).toSet ==
      Set(("Dusseldorf", "51.225555", "6.782778"), ("Amsterdam", "52.36667", "4.9")))
    assert(geo(0, 0, 20) == Seq(("Missing Island", "0.0", "0.0")))
  }

  test("broken sort clauses carry the reference texts (sort_test.go:1136-1219)") {
    def err(doc: String): String =
      intercept[Exception](g.get(GraphQL.get(g, doc))).getMessage
    assert(err("""{ Get { City(sort:[{path:[] order:asc}]) { name } } }""") ==
      "invalid 'sort' parameter: sort parameter at position 0: path parameter cannot be empty")
    assert(err("""{ Get { City(sort:[{path:[""] order:asc}]) { name } } }""") ==
      "invalid 'sort' parameter: sort parameter at position 0: " +
      "no such prop with name '' found in class 'City' in the schema. " +
      "Check your schema files for which properties in this class are available")
    assert(err("""{ Get { City(sort:[{path:["ref","prop"] order:asc}]) { name } } }""") ==
      "invalid 'sort' parameter: sort parameter at position 0: " +
      "sorting by reference not supported, path must have exactly one argument")
    assert(err("""{ Get { City(sort:[{path:["nonexistentproperty"] order:asc}]) { name } } }""") ==
      "invalid 'sort' parameter: sort parameter at position 0: " +
      "no such prop with name 'nonexistentproperty' found in class 'City' in the schema. " +
      "Check your schema files for which properties in this class are available")
    assert(err("""{ Get { City(sort:[{path:["inCountry"] order:asc}]) { name } } }""") ==
      "invalid 'sort' parameter: sort parameter at position 0: " +
      "sorting by reference not supported, " +
      """property "inCountry" is a ref prop to the class "Country"""")
    assert(intercept[Exception](GraphQL.get(g,
      """{ Get { NonExistentClass(sort:[{path:["property"] order:asc}]) { name } } }"""))
      .getMessage == """Cannot query field "NonExistentClass" on type "GetObjectsObj".""")
  }

  test("aggregate matrix: no-groupBy stat sets (matrix_no_groupby_test.go:195-248)") {
    val all = g.aggregate(GraphQL.aggregate(g,
      """{ Aggregate { City {
        |  meta { count }
        |  population { count maximum minimum mode sum median mean }
        |  cityArea { count maximum minimum mode sum median mean }
        |  isCapital { count totalTrue totalFalse percentageTrue percentageFalse }
        |  name { count }
        |  museums { count }
        |  timezones { count }
        |  history { count }
        |  inCountry { pointingTo }
        |} } }""".stripMargin)).collect().head
    def v(n: String): Any = all.get(all.fieldIndex(n))
    assert(v("meta_count") == 6L)
    assert(v("population_count") == 5L); assert(v("population_maximum") == 3470000L)
    assert(v("population_minimum") == 0L); assert(v("population_mode") == 600000L)
    assert(v("population_sum") == 6470000L); assert(v("population_median") == 600000.0)
    assert(v("population_mean") == 1294000.0)
    assert(v("cityArea_count") == 4L); assert(v("cityArea_maximum") == 891.96)
    assert(v("cityArea_minimum") == 217.22); assert(v("cityArea_mode") == 217.22)
    assert(math.abs(v("cityArea_sum").asInstanceOf[Double] - 2320.48) < 1e-9)
    assert(math.abs(v("cityArea_median").asInstanceOf[Double] - 605.65) < 1e-9)
    assert(math.abs(v("cityArea_mean").asInstanceOf[Double] - 580.12) < 1e-9)
    assert(v("isCapital_count") == 5L); assert(v("isCapital_totalTrue") == 2L)
    assert(v("isCapital_totalFalse") == 3L)
    assert(v("isCapital_percentageTrue") == 0.4); assert(v("isCapital_percentageFalse") == 0.6)
    assert(v("name_count") == 5L)
    assert(v("museums_count") == 9L); assert(v("timezones_count") == 8L)
    assert(v("history_count") == 4L)
    assert(v("inCountry_pointingTo") == "Country")
  }

  test("aggregate near/where scoping (matrix_setup_test.go:966-1010, local_aggregate_test.go)") {
    def agg(filters: String): org.apache.spark.sql.Row =
      g.aggregate(GraphQL.aggregate(g,
        s"""{ Aggregate { City($filters) { meta { count } population { sum } } } }"""))
        .select(col("meta_count"), col("population_sum").cast("double"))
        .collect().head
    // nearObject Berlin certainty bands (the matrix's three scopes)
    assert(agg(s"""nearObject: {id: "${CitiesFixture.Berlin}" certainty: 0.1}""").getLong(0) == 6L)
    val withData = agg(s"""nearObject: {id: "${CitiesFixture.Berlin}" certainty: 0.81}""")
    assert(withData.getLong(0) == 2L && withData.getDouble(1) == 5270000.0)
    assert(agg(s"""nearObject: {id: "${CitiesFixture.NullIsland}" certainty: 0.9}""").getLong(0) == 1L)
    // Like on the id pseudo-prop selects all / one / none
    assert(agg("""where: {operator: Like path: ["id"] valueText: "*"}""").getLong(0) == 6L)
    assert(agg(s"""where: {operator: Like path: ["id"] valueText: "${CitiesFixture.NullIsland}"}""").getLong(0) == 1L)
    assert(agg("""where: {operator: Like path: ["id"] valueText: "00000000-0000-0000-0000-000000000000"}""").getLong(0) == 0L)
    // nearText Amsterdam 0.2 + isCapital → Amsterdam only (aggregate_test.go:48-157)
    val ams = agg("""where: {valueBoolean: true, operator: Equal, path: ["isCapital"]}
      |nearText: {concepts: ["Amsterdam"] distance: 0.2}""".stripMargin)
    assert(ams.getLong(0) == 1L && ams.getDouble(1) == 1800000.0)
    // nearObject Berlin 0.2 + isCapital → Berlin only (aggregate_test.go:269-380)
    val ber = agg(s"""where: {valueBoolean: true, operator: Equal, path: ["isCapital"]}
      |nearObject: {id: "${CitiesFixture.Berlin}" distance: 0.2}""".stripMargin)
    assert(ber.getLong(0) == 1L && ber.getDouble(1) == 3470000.0)
  }

  test("aggregate groupBy cityArea keeps the reference groups (matrix_groupby_test.go:943-1070)") {
    val groups = g.aggregate(GraphQL.aggregate(g,
      """{ Aggregate { City(groupBy: ["cityArea"]) {
        |  groupedBy { value } meta { count } population { sum } museums { count }
        |} } }""".stripMargin))
      .select(col("groupedBy_value").cast("string"), col("meta_count"),
        col("population_sum").cast("double"), col("museums_count"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(groups == Set(
      ("891.96", 1L, 3470000.0, 1L), ("891.95", 1L, 1800000.0, 2L),
      ("217.22", 1L, 600000.0, 3L), ("319.35", 1L, 600000.0, 3L)))
  }

  test("person filter journeys (filter_test.go:258-436)") {
    def persons(where: String): Seq[String] =
      g.get(GraphQL.get(g, s"{ Get { Person(where: $where) { name } } }"))
        .select(col("name")).collect().map(_.getString(0)).sorted.toSeq
    assert(persons("""{valueInt: 0 operator: Equal, path: ["livesIn"]}""") == Seq("Alice"))
    assert(persons("""{valueInt: 1 operator: Equal, path: ["livesIn"]}""") == Seq("Bob"))
    assert(persons("""{valueInt: 2 operator: GreaterThanEqual, path: ["livesIn"]}""") ==
      Seq("John", "Petra"))
    assert(persons("""{valueText: "Quality" operator: Equal, path: ["profession"]}""").isEmpty)
    assert(persons("""{valueText: "Mechanical Engineer" operator: Equal, path: ["profession"]}""") == Seq("Bob"))
    assert(persons("""{valueText: "loves travelling" operator: Equal, path: ["about"]}""") ==
      Seq("Bob", "John"))
    assert(persons("""{valueText: "likes cooking for family" operator: Equal, path: ["about"]}""") == Seq("Petra"))
  }

  test("people-by-city groupBy replay (group_by_test.go:25-120)") {
    val page = g.get(GraphQL.get(g,
      s"""{ Get { Person(
         |    nearObject: {id: "${CitiesFixture.Bob}"}
         |    groupBy: {path: ["livesIn"] groups: 4 objectsPerGroup: 10})
         |  { _additional { id group { groupedBy { value } } } } } }""".stripMargin))
    val groups = page.select(col("group_index").cast("long"), col("group_value"), col("_id"))
      .collect().groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (_, hits) =>
        (Option(hits.head.getString(1)).getOrElse(""), hits.map(_.getString(2)).toSet)
      }
    assert(groups.map(_._1) == Seq(CitiesFixture.Amsterdam, CitiesFixture.Berlin,
      "", CitiesFixture.Dusseldorf))
    assert(groups(0)._2 == Set(CitiesFixture.Bob, CitiesFixture.John, CitiesFixture.Petra))
    assert(groups(1)._2 == Set(CitiesFixture.John, CitiesFixture.Petra))
    assert(groups(2)._2 == Set(CitiesFixture.Alice))
    assert(groups(3)._2 == Set(CitiesFixture.Petra))
  }

  test("company legacy grouping (grouping_test.go): force 1.0 merges all, 0.0 none") {
    import graft.operators.MergeGrouper
    val full = GraphQL.getFull(g,
      "{ Get { Company(group: {type: merge, force: 1.0}) { name inCity { ... on City {name} } } } }")
    val pool = g.get(full.params.copy(additional = full.params.additional + "vector",
      resolveRefs = Nil, properties = Seq("name", "inCity")))
    val merged = MergeGrouper.group(pool, "_vector", 1.0, MergeGrouper.Merge).collect()
    assert(merged.length == 1)
    val name = merged.head.getString(merged.head.fieldIndex("name"))
    Seq("Apple", "Google", "Microsoft").foreach(n => assert(name.contains(n)))
    assert(name.matches(".*\\(.*\\)"))  // "first (rest, …)" shape
    val cities = merged.head.getSeq[String](merged.head.fieldIndex("inCity"))
      .map(CitiesFixture.cityName).sorted
    assert(cities == Seq("Amsterdam", "Berlin", "Dusseldorf"))
    val unmerged = MergeGrouper.group(pool, "_vector", 0.0, MergeGrouper.Merge)
    assert(unmerged.count() == 9)
  }

  test("date aggregations carry ns precision through median (aggregate_test.go:1441)") {
    // served through the q_fixture_agg_dates gate end-to-end; here pin the
    // groupBy-string coercion the document uses
    val p = GraphQL.aggregate(g,
      """{ Aggregate { City(groupBy: "isCapital") { meta { count } } } }""")
    assert(p.groupBy.contains(Seq("isCapital")))
  }

  test("the shared angular embedding plan: every anchor's angle is pinned once") {
    // the single source of truth for every stand-in embedding space — a
    // future suite that moves an anchor must move it HERE, not re-derive
    // per-suite (round-15 consolidation)
    def angleOf(v: Array[Float]): Double =
      math.toDegrees(math.atan2(v(1).toDouble, v(0).toDouble))
    assert(math.abs(angleOf(CitiesFixture.unit(60.0)) - 60.0) < 1e-4) // float32 anchors
    assert(CitiesFixture.unit(0.0).toSeq == Seq(1.0f, 0.0f, 0.0f))
    assert(CitiesFixture.unitSeq(90.0)(1) == 1.0f)
    // appleVec IS the Apple-Inc. object anchor at 60° (hybrid suite);
    // the query-side "Apple" concept sits 0.4° off it so the vector leg
    // ranks Apple Inc. > Apple Incorporated > Apple
    assert(math.abs(angleOf(CitiesFixture.appleVec) - 60.0) < 1e-4) // float32 anchors
    assert(math.abs(angleOf(CitiesFixture.embedder("Apple")) - 60.4) < 1e-4) // float32 anchors
    // embedder concept anchors (the contextionary stand-in)
    assert(math.abs(angleOf(CitiesFixture.embedder("Berlin")) - 15.0) < 1e-4) // float32 anchors
    assert(math.abs(angleOf(CitiesFixture.embedder("Amsterdam")) - 50.0) < 1e-4) // float32 anchors
    assert(math.abs(angleOf(CitiesFixture.embedder("hi")) - 70.0) < 1e-4) // float32 anchors
    // unknown concepts land at the corpus center (70°)
    assert(angleOf(CitiesFixture.embedder("zzz-unknown")) ==
      angleOf(CitiesFixture.embedder("hi")))
  }
}
