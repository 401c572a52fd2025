package graft

import org.apache.spark.sql.functions._

import graft.engine.{Collection, Graft}
import graft.model._

class FilterCompilerSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val g: Graft = {
    val gg = new Graft(spark)
    val people = Seq(
      (1L, "Alice Smith", 30L, 4.5, "engineering", Seq("scala", "spark"), 10L),
      (2L, "Bob Jones", 25L, 3.2, "marketing", Seq("ads"), 20L),
      (3L, "Carol Smith", 35L, 4.9, "engineering", Seq("spark", "sql"), 10L),
      (4L, "Dave Brown", 40L, 2.0, "sales", Seq.empty[String], 30L))
      .toDF("id", "name", "age", "rating", "dept", "tags", "city_id")
      .withColumn("nickname", when($"id" === 4, lit(null).cast("string")).otherwise($"name"))
      // object[] bed for correlated nested-array filters: id 1 has a single
      // element satisfying BOTH (k=a, v=9); id 2 satisfies k=a and v>8 only on
      // DIFFERENT elements — the correlated And must reject it
      .withColumn("exps", expr("""CASE
        | WHEN id = 1 THEN array(named_struct('k','a','v',9L), named_struct('k','b','v',1L))
        | WHEN id = 2 THEN array(named_struct('k','a','v',2L), named_struct('k','b','v',9L))
        | WHEN id = 3 THEN array(named_struct('k','c','v',5L))
        | ELSE slice(array(named_struct('k','x','v',0L)), 1, 0) END""".stripMargin))
      // multi-edge cref bed: id 1 → {2,3}, id 2 → {3}, id 3 → empty, id 4 → null
      .withColumn("friend_ids", expr("""CASE
        | WHEN id = 1 THEN array(2L, 3L)
        | WHEN id = 2 THEN array(3L)
        | WHEN id = 3 THEN slice(array(0L), 1, 0)
        | ELSE CAST(NULL AS ARRAY<BIGINT>) END""".stripMargin))
    gg.register(CollectionSchema("Person", "id", Seq(
      Property("name", PropType.Text, Tokenization.Word),
      Property("age", PropType.Int),
      Property("rating", PropType.Number),
      Property("dept", PropType.Text, Tokenization.Field),
      Property("tags", PropType.Arr(PropType.Text)),
      Property("nickname", PropType.Text, Tokenization.Field),
      Property("exps", PropType.Arr(PropType.Obj)),
      Property("city_id", PropType.Ref, refTarget = Some("City")),
      Property("friend_ids", PropType.Ref, refTarget = Some("Person"))),
      // IsNull / len() tests need the reference's class-level opt-ins
      invertedIndex = InvertedIndexConfig(
        indexNullState = true, indexPropertyLength = true, indexTimestamps = true)), people)
    val cities = Seq((10L, "Berlin", 3600000L), (20L, "Paris", 2100000L), (30L, "Rome", 2800000L))
      .toDF("cid", "cname", "pop")
    gg.register(CollectionSchema("City", "cid", Seq(
      Property("cname", PropType.Text, Tokenization.Field),
      Property("pop", PropType.Int))), cities)
    gg
  }

  private def ids(w: Where): Seq[Long] =
    g.get(GetParams("Person", where = Some(w), properties = Seq("id")))
      .collect().map(_.getLong(0)).toSeq.sorted

  test("tokenized text Equal matches per-token") {
    assert(ids(Where.eqText("name", "smith")) == Seq(1L, 3L))
    assert(ids(Where.eqText("name", "Alice Smith")) == Seq(1L)) // all tokens required
  }

  test("numeric range + And") {
    assert(ids(Where.and(Where.geInt("age", 30L), Where.gtNum("rating", 4.0))) == Seq(1L, 3L))
  }

  test("Or / Not compose") {
    assert(ids(Where.or(Where.eqText("dept", "sales"), Where.ltInt("age", 26L))) == Seq(2L, 4L))
    assert(ids(Where.not(Where.eqText("dept", "engineering"))) == Seq(2L, 4L))
  }

  test("Like wildcards ? and *") {
    assert(ids(Where.like("name", "*Smith")) == Seq(1L, 3L))
    assert(ids(Where.like("dept", "?ales")) == Seq(4L))
  }

  test("IsNull both polarities") {
    assert(ids(Where.isNull("nickname")) == Seq(4L))
    assert(ids(Where.isNull("nickname", v = false)) == Seq(1L, 2L, 3L))
  }

  test("ContainsAny / ContainsAll / ContainsNone on arrays") {
    assert(ids(Where.containsAnyText("tags", Seq("spark", "ads"))) == Seq(1L, 2L, 3L))
    assert(ids(Where.containsAllText("tags", Seq("spark", "sql"))) == Seq(3L))
    assert(ids(Where.containsNoneText("tags", Seq("spark"))) == Seq(2L, 4L))
  }

  test("len() pseudo-path on text and arrays") {
    assert(ids(Where.gtInt("len(tags)", 1L)) == Seq(1L, 3L))
    assert(ids(Where.gtInt("len(name)", 10L)) == Seq(1L, 3L)) // "Alice Smith"=11, "Carol Smith"=11
  }

  test("cross-reference filter (semi-join) and Not over it") {
    val berlinOnly = Where(WhereOp.GreaterThan, Seq("city_id", "City", "pop"),
      Some(FilterValue.IntV(3000000L)))
    assert(ids(berlinOnly) == Seq(1L, 3L))
    assert(ids(Where.not(berlinOnly)) == Seq(2L, 4L))
  }

  test("correlated nested-array And matches same element only") {
    val corr = Where.and(Where.eqText("exps/k", "a"), Where.gtInt("exps/v", 8L))
    assert(ids(corr) == Seq(1L)) // id 2 satisfies the legs on different elements
    // uncorrelated (separate Or legs) still sees both elements
    assert(ids(Where.or(Where.eqText("exps/k", "a"), Where.gtInt("exps/v", 8L))) == Seq(1L, 2L))
    // Not over a nested leaf = no element matches
    assert(ids(Where.not(Where.eqText("exps/k", "a"))) == Seq(3L, 4L))
    // nested leaf composes with a plain predicate under And
    assert(ids(Where.and(Where.eqText("exps/k", "b"), Where.geInt("age", 30L))) == Seq(1L))
  }

  test("ref filter composes with plain predicate under Or") {
    val refLeaf = Where(WhereOp.Equal, Seq("city_id", "City", "cname"),
      Some(FilterValue.TextV("Paris")))
    assert(ids(Where.or(refLeaf, Where.eqText("dept", "sales"))) == Seq(2L, 4L))
  }

  test("ref-count filter on a multi-edge cref; null list counts 0") {
    assert(ids(Where.geInt("friend_ids", 1L)) == Seq(1L, 2L))
    assert(ids(Where.eqInt("friend_ids", 2L)) == Seq(1L))
    // empty list and NULL list both have 0 edges (reference complement incl. nulls)
    assert(ids(Where.eqInt("friend_ids", 0L)) == Seq(3L, 4L))
    assert(ids(Where.not(Where.geInt("friend_ids", 1L))) == Seq(3L, 4L))
  }

  test("phoneNumber: subfield filter works, direct struct filter fails loudly") {
    val gg = new Graft(spark)
    val rows = Seq(
      (1L, "+4915112345678", "DE", "15112345678"),
      (2L, "+14155550123", "US", "4155550123"),
      (3L, "+4915198765432", "DE", "15198765432"))
      .toDF("id", "input", "countryCode", "national")
      .select($"id", struct($"input", $"countryCode", $"national").as("phone"))
    gg.register(CollectionSchema("Contact", "id", Seq(
      Property("phone", PropType.Phone))), rows)
    val got = gg.get(GetParams("Contact",
      where = Some(Where.eqText("phone/countryCode", "DE")),
      properties = Seq("id"))).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 3L))
    val err = intercept[IllegalArgumentException] {
      gg.get(GetParams("Contact",
        where = Some(Where.eqText("phone", "+4915112345678")))).collect()
    }
    assert(err.getMessage.contains("subfield"))
  }

  test("scalar-FK Int Equal means FK equality, not edge count") {
    // everyone has exactly one city edge; count semantics would return nobody
    assert(ids(Where.eqInt("city_id", 10L)) == Seq(1L, 3L))
    assert(ids(Where.neInt("city_id", 10L)) == Seq(2L, 4L))
  }

  test("len(ref) is the layout-independent edge count on both backings") {
    // array cref: size, with empty and null both counting 0
    assert(ids(Where.geInt("len(friend_ids)", 1L)) == Seq(1L, 2L))
    assert(ids(Where.eqInt("len(friend_ids)", 0L)) == Seq(3L, 4L))
    assert(ids(Where.eqInt("len(friend_ids)", 2L)) == Seq(1L))
    // scalar FK: 0/1 edge count — NOT string length, NOT FK-value compare
    assert(ids(Where.eqInt("len(city_id)", 1L)) == Seq(1L, 2L, 3L, 4L))
    assert(ids(Where.eqInt("len(city_id)", 0L)) == Seq.empty)
  }

  test("array-cref path filter (beacon-list semi-join) through And/Or/Not") {
    val friendInEng = Where(WhereOp.Equal, Seq("friend_ids", "Person", "dept"),
      Some(FilterValue.TextV("engineering")))
    assert(ids(friendInEng) == Seq(1L, 2L))
    assert(ids(Where.not(friendInEng)) == Seq(3L, 4L))
    assert(ids(Where.and(friendInEng, Where.eqText("dept", "engineering"))) == Seq(1L))
    assert(ids(Where.or(friendInEng, Where.eqText("dept", "sales"))) == Seq(1L, 2L, 4L))
  }

  test("validation matrix rejects invalid type/operator combos with friendly errors") {
    import FilterValue._
    // (clause, expected error fragment) — the type-vs-operator matrix of
    // entities/filters/filters_validator.go
    val cases: Seq[(Where, String)] = Seq(
      Where.like("age", "3*")                          -> "only supported on text",
      Where.eqText("age", "x")                         -> "use \"valueInt\" instead",
      Where.eqInt("name", 3L)                          -> "use \"valueText\" instead",
      Where.gtNum("age", 1.5)                          -> "use \"valueInt\" instead",
      Where.gtInt("rating", 3L)                        -> "use \"valueNumber\" instead",
      Where.eqBool("name", true)                       -> "use \"valueText\" instead",
      Where(WhereOp.ContainsAny, Seq("age"),
        Some(ListV(Seq(TextV("x")))))                  -> "use \"valueInt\" instead",
      Where(WhereOp.IsNull, Seq("age"),
        Some(IntV(1L)))                                -> "requires a booleanValue",
      Where.gtInt("len(name)", -1L)                    -> "positive property length",
      Where(WhereOp.Like, Seq("len(name)"),
        Some(IntV(1L)))                                -> "property length supports operators",
      Where(WhereOp.GreaterThan, Seq("len(name)"),
        Some(NumberV(1.0)))                            -> "requires valueInt",
      Where.gtInt("len(nope)", 1L)                     -> "no such prop",
      Where.eqText("city_id", "Berlin")                -> "is a ref prop",
      Where.eqText("nope", "x")                        -> "no such prop",
      Where(WhereOp.WithinGeoRange, Seq("name"),
        Some(GeoRangeV(1, 2, 3)))                      -> "requires a geoCoordinates property",
      Where(WhereOp.Equal, Seq("_id"),
        Some(BoolV(true)))                             -> "must use valueText or valueInt",
      Where(WhereOp.WithinGeoRange, Seq("_id"),
        Some(GeoRangeV(1, 2, 3)))                      -> "not supported on the id property")
    cases.foreach { case (w, frag) =>
      val e = intercept[IllegalArgumentException] { ids(w) }
      assert(e.getMessage.toLowerCase.contains(frag.toLowerCase),
        s"for $w expected '$frag', got: ${e.getMessage}")
    }
    // the RAW id column (not a declared property) accepts valueInt like
    // "_id" — ids are schema-typed here, not uuid-text (review regression pin)
    assert(ids(Where.eqInt("id", 1L)) == Seq(1L))
    assert(ids(Where.gtInt("id", 2L)) == Seq(3L, 4L))
    // Like with a text pattern is VALID on the id pseudo-prop (the
    // reference validator constrains only the value type,
    // filters_validator.go:209-216; its aggregate matrix selects objects
    // with `operator: Like path: ["id"]`) — non-string id columns match
    // against their string render
    assert(ids(Where.like("id", "1*")) == Seq(1L))
    assert(ids(Where.like("_id", "*")) == Seq(1L, 2L, 3L, 4L))
    // invalid leaves are rejected inside compound trees too
    val bad = Where.and(Where.eqText("dept", "engineering"), Where.like("age", "3*"))
    intercept[IllegalArgumentException] { ids(bad) }
    // geo: negative radius rejected; ref tail validated against the TARGET class
    val g2 = Fixtures.graft(spark, "/root/testdata/sf0.001")
    intercept[IllegalArgumentException] {
      g2.get(GetParams("Customer",
        where = Some(Where.withinGeoRange("geo", 1, 2, -5)), properties = Seq("c_custkey")))
        .collect()
    }
    val refTail = intercept[IllegalArgumentException] { ids(Where.eqInt("city_id/City/cname", 1L)) }
    assert(refTail.getMessage.contains("valueText"))
  }

  test("inverted-index gates: len/IsNull/timestamps default OFF; no-index props unfilterable") {
    import spark.implicits._
    // a class WITHOUT the opt-ins and with one never-indexed property —
    // the reference's defaults (prop_value_pairs.go:379-389, searcher.go:919)
    val rows = Seq((1L, "a", 5L, 2L), (2L, "b", 6L, 3L)).toDF("id", "nm", "secret", "ts_n")
    g.register(CollectionSchema("Gated", "id", Seq(
      Property("nm", PropType.Text, Tokenization.Field),
      Property("secret", PropType.Int, indexFilterable = false),
      Property("loose_ref", PropType.Ref, refTarget = Some("City"),
        indexFilterable = false)),
      creationTimeColumn = Some("ts_n")), rows.withColumn("loose_ref", col("id")))
    def q(w: Where) = g.get(GetParams("Gated", where = Some(w), properties = Seq("id"))).collect()

    val lenErr = intercept[IllegalArgumentException] { q(Where.gtInt("len(nm)", 1L)) }
    assert(lenErr.getMessage.contains("Property length must be indexed to be filterable! " +
      "add `IndexPropertyLength: true` to the invertedIndexConfig in Gated"))
    val nullErr = intercept[IllegalArgumentException] { q(Where.isNull("nm")) }
    assert(nullErr.getMessage.contains("Nullstate must be indexed to be filterable! " +
      "Add `indexNullState: true` to the invertedIndexConfig"))
    val tsErr = intercept[IllegalArgumentException] {
      q(Where(WhereOp.GreaterThan, Seq("_creationTimeUnix"), Some(FilterValue.IntV(1L))))
    }
    assert(tsErr.getMessage.contains("Timestamps must be indexed to be filterable! " +
      "Add `IndexTimestamps: true` to the InvertedIndexConfig in Gated"))
    val noIdx = intercept[IllegalArgumentException] { q(Where.eqInt("secret", 5L)) }
    assert(noIdx.getMessage.contains("Filtering by property 'secret' requires inverted index. " +
      "Is `indexFilterable` option of property 'secret' enabled?"))
    // ref meta-count gate: both the direct valueInt form and len(ref)
    val cntErr = intercept[IllegalArgumentException] { q(Where.eqInt("loose_ref", 1L)) }
    assert(cntErr.getMessage.contains("Searching by property 'loose_ref' count requires inverted index"))
    val lenRefErr = intercept[IllegalArgumentException] { q(Where.eqInt("len(loose_ref)", 1L)) }
    assert(lenRefErr.getMessage.contains("Searching by property 'loose_ref' count requires inverted index"))
    // a text prop with filterable OFF but searchable ON still filters
    // (HasAnyInvertedIndex fallback, objects.go:611) — and rangeable rescues
    // an int prop with filterable OFF
    g.register(CollectionSchema("Gated2", "id", Seq(
      Property("nm", PropType.Text, Tokenization.Field, indexFilterable = false),
      Property("n", PropType.Int, indexFilterable = false, indexRangeFilters = true))),
      Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("id", "nm", "n"))
    def q2(w: Where) = g.get(GetParams("Gated2", where = Some(w), properties = Seq("id"))).collect()
    assert(q2(Where.eqText("nm", "a")).map(_.getLong(0)).toSeq == Seq(1L))
    assert(q2(Where.gtInt("n", 5L)).map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("text[] filters: tokenized Equal/ContainsAny match merged element tokens; Like any element") {
    val gg = new Graft(spark)
    gg.register(CollectionSchema("Chunked", "id", Seq(
      Property("chunks", PropType.Arr(PropType.Text), Tokenization.Word),
      Property("labels", PropType.Arr(PropType.Text), Tokenization.Field))),
      Seq(
        (1L, Seq("spark makes joins", "fast and wide"), Seq("Big Data", "ml")),
        (2L, Seq("plain prose here"), Seq("prose")),
        (3L, Seq(null, "spark again"), Seq("Big Data"))
      ).toDF("id", "chunks", "labels"))
    def ids(w: Where): Seq[Long] =
      gg.get(GetParams("Chunked", where = Some(w), properties = Seq("id")))
        .collect().map(_.getLong(0)).toSeq.sorted
    // tokenized Equal hits a token inside ANY element (null elements skipped)
    assert(ids(Where.eqText("chunks", "spark")) == Seq(1L, 3L))
    // multi-token value: every token must appear somewhere in the merged set
    assert(ids(Where.eqText("chunks", "wide spark")) == Seq(1L))
    // ContainsAny per value, per token
    assert(ids(Where.containsAnyText("chunks", Seq("prose", "wide"))) == Seq(1L, 2L))
    // Like matches whole ELEMENT values, case-sensitive, any element
    assert(ids(Where.like("chunks", "*joins")) == Seq(1L))
    assert(ids(Where.like("chunks", "spark *")) == Seq(1L, 3L))
    // field-tokenized text[] keeps whole-element equality (no token split)
    assert(ids(Where.containsAnyText("labels", Seq("Big Data"))) == Seq(1L, 3L))
    assert(ids(Where.containsAnyText("labels", Seq("Big"))) == Seq())
  }

  test("utcTs parses RFC3339 zoned forms, not only naive timestamps") {
    def ms(s: String): Long = graft.model.Where.utcTs(s).getTime
    assert(ms("2024-01-01T10:00:00Z") == ms("2024-01-01 10:00:00"))
    assert(ms("2024-01-01T12:00:00+02:00") == ms("2024-01-01 10:00:00"))
    assert(ms("2024-01-01") == ms("2024-01-01 00:00:00"))
  }

  test("multi-vector schema without a default requires an explicit target") {
    val s2 = graft.model.CollectionSchema("MV", "id", Seq.empty,
      vectors = Map("a" -> "va", "b" -> "vb"))
    assert(intercept[IllegalArgumentException] { s2.vectorColumn(None) }
      .getMessage.contains("specify targetVectors"))
    assert(s2.vectorColumn(Some("b")) == "vb")
    // a typo'd target errors instead of silently resolving to cosine
    assert(intercept[IllegalArgumentException] { s2.metricFor(Some("typo")) }
      .getMessage.contains("no vector named"))
    // single-vector collections keep the implicit default
    val s1 = graft.model.CollectionSchema("SV", "id", Seq.empty,
      vectors = Map("only" -> "v"))
    assert(s1.vectorColumn(None) == "v")
  }
}
