package graft

import graft.model._
import graft.sources.SchemaWire

/**
 * Schema wire-decoder parity: a weaviate `models.Class` JSON document
 * (POST /v1/schema body) decodes to EXACTLY the CollectionSchema a
 * programmatic caller builds, with the reference's normalization
 * (UppercaseClassName, LowercaseAllPropertyNames), the v1.19 string→text
 * migration, and the creation-time validation errors verbatim
 * (usecases/schema/class.go, entities/schema/validation.go, data_types.go).
 */
class SchemaWireSpec extends SparkSpecBase {

  private def err(json: String, tenantColumn: Option[String] = None): String =
    intercept[IllegalArgumentException](
      SchemaWire.decodeClass(json, "doc_id", tenantColumn = tenantColumn)).getMessage

  test("full class document decodes to the programmatic twin") {
    val decoded = SchemaWire.decodeClass(
      """{"class": "Article",
        |  "properties": [
        |    {"name": "title", "dataType": ["text"], "tokenization": "word"},
        |    {"name": "body", "dataType": ["text"], "tokenization": "whitespace",
        |     "textAnalyzer": {"asciiFold": true}},
        |    {"name": "wordCount", "dataType": ["int"], "indexRangeFilters": true},
        |    {"name": "score", "dataType": ["number"]},
        |    {"name": "published", "dataType": ["date"]},
        |    {"name": "flags", "dataType": ["boolean[]"]},
        |    {"name": "spot", "dataType": ["geoCoordinates"]},
        |    {"name": "author", "dataType": ["Author"]}],
        |  "invertedIndexConfig": {
        |    "indexTimestamps": true, "indexNullState": true, "indexPropertyLength": true,
        |    "stopwords": {"preset": "en", "additions": ["spark"], "removals": ["the"]}},
        |  "vectorConfig": {
        |    "default": {"vectorIndexConfig": {"distance": "cosine"}},
        |    "rev": {"vectorIndexConfig": {"distance": "l2-squared"}}}
        |}""".stripMargin,
      idColumn = "article_id",
      vectorColumns = Map("default" -> "embedding"))
    val twin = CollectionSchema("Article", "article_id", Seq(
      Property("title", PropType.Text),
      Property("body", PropType.Text, Tokenization.Whitespace, asciiFold = true),
      Property("wordCount", PropType.Int, indexSearchable = false, indexRangeFilters = true),
      Property("score", PropType.Number, indexSearchable = false),
      Property("published", PropType.Date, indexSearchable = false),
      Property("flags", PropType.Arr(PropType.Bool), indexSearchable = false),
      Property("spot", PropType.Geo, indexSearchable = false),
      Property("author", PropType.Ref, refTarget = Some("Author"), indexSearchable = false)),
      vectors = Map("default" -> "embedding", "rev" -> "rev"),
      defaultVector = Some("default"),
      stopwords = StopwordConfig("en", additions = Seq("spark"), removals = Seq("the")),
      invertedIndex = InvertedIndexConfig(
        indexTimestamps = true, indexNullState = true, indexPropertyLength = true),
      vectorMetrics = Map("default" -> Metric.Cosine, "rev" -> Metric.L2Squared))
    assert(decoded == twin)
  }

  test("normalization: class uppercased, property names lower-cased first") {
    val s = SchemaWire.decodeClass(
      """{"class": "article", "properties": [{"name": "Title", "dataType": ["text"]}]}""",
      "id")
    assert(s.name == "Article")
    assert(s.properties.head.name == "title")
  }

  test("v1.19 string migration: string→text, word→whitespace, field stays") {
    val s = SchemaWire.decodeClass(
      """{"class": "Legacy", "properties": [
        |  {"name": "a", "dataType": ["string"], "tokenization": "word"},
        |  {"name": "b", "dataType": ["string[]"], "tokenization": "field"},
        |  {"name": "c", "dataType": ["string"]}]}""".stripMargin, "id")
    assert(s.properties(0) == Property("a", PropType.Text, Tokenization.Whitespace))
    assert(s.properties(1) == Property("b", PropType.Arr(PropType.Text), Tokenization.Field))
    assert(s.properties(2) == Property("c", PropType.Text, Tokenization.Whitespace))
    // string only allows word/field (class.go:1218-1223)
    assert(err("""{"class": "L", "properties": [{"name": "a", "dataType": ["string"], "tokenization": "trigram"}]}""")
      == "tokenization 'trigram' is not allowed for data type 'string'")
  }

  test("name validation errors verbatim") {
    assert(err("""{"class": "1Bad"}""") == "'1Bad' is not a valid class name")
    assert(err("""{"class": "Has space"}""") == "'Has space' is not a valid class name")
    assert(err("""{"class": "Doc", "properties": [{"name": "has-dash", "dataType": ["text"]}]}""")
      == "'has-dash' is not a valid property name. Property names in Weaviate are " +
        "restricted to valid GraphQL names, which must be “/[_A-Za-z][_0-9A-Za-z]{0,230}/”")
    assert(err("""{"class": "Doc", "properties": [{"name": "_additional", "dataType": ["text"]}]}""")
      == "'_additional' is a reserved property name")
    assert(err("""{"class": "Doc", "properties": [{"name": "foo_searchable", "dataType": ["text"]}]}""")
      == "'foo_searchable' is not a valid property name: suffix '_searchable' is reserved for internal indices")
    assert(err(
      """{"class": "Doc", "properties": [
        |  {"name": "text", "dataType": ["text"]}, {"name": "Text", "dataType": ["text"]}]}""".stripMargin)
      == "class \"Doc\": conflict for property \"text\": already in use or provided multiple times")
  }

  test("dataType validation errors verbatim, with the validateProperty wrap") {
    assert(err("""{"class": "Doc", "properties": [{"name": "x", "dataType": []}]}""")
      == "property 'x': invalid dataType: []: dataType must have at least one element")
    assert(err("""{"class": "Doc", "properties": [{"name": "x", "dataType": [""]}]}""")
      == "property 'x': invalid dataType: []: dataType cannot be an empty string")
    assert(err("""{"class": "Doc", "properties": [{"name": "x", "dataType": ["txet"]}]}""")
      == "property 'x': invalid dataType: [txet]: unknown primitive data type 'txet'")
  }

  test("ref dataTypes: self-reference allowed, nonexistent class checked when known set given") {
    val selfRef = SchemaWire.decodeClass(
      """{"class": "Doc", "properties": [{"name": "parent", "dataType": ["Doc"]}]}""", "id")
    assert(selfRef.properties.head.refTarget.contains("Doc"))
    val e = intercept[IllegalArgumentException](SchemaWire.decodeClass(
      """{"class": "Doc", "properties": [{"name": "r", "dataType": ["Ghost"]}]}""",
      "id", knownClasses = Set("Doc", "Other"))).getMessage
    assert(e == "property 'r': invalid dataType: [Ghost]: reference property to nonexistent class")
  }

  test("tokenization / indexing / vector / stopword / tenancy validation") {
    assert(err("""{"class": "Doc", "properties": [{"name": "n", "dataType": ["int"], "tokenization": "word"}]}""")
      == "tokenization is not allowed for data type 'int'")
    assert(err("""{"class": "Doc", "properties": [{"name": "o", "dataType": ["object"], "tokenization": "word"}]}""")
      == "tokenization is not allowed for object/object[] data types")
    assert(err("""{"class": "Doc", "properties": [{"name": "r", "dataType": ["Doc"], "tokenization": "word"}]}""")
      == "tokenization is not allowed for reference data type")
    assert(err("""{"class": "Doc", "properties": [{"name": "t", "dataType": ["text"], "tokenization": "gse"}]}""")
      == "the GSE tokenizer is not enabled; set 'ENABLE_TOKENIZER_GSE' to 'true' to enable")
    assert(err("""{"class": "Doc", "properties": [{"name": "n", "dataType": ["int"], "indexSearchable": true}]}""")
      == "`indexSearchable` is allowed only for text/text[] data types. For other data types set false or leave empty")
    assert(err("""{"class": "Doc", "vectorIndexConfig": {"distance": "euclid"}}""")
      == "unrecognized distance metric \"euclid\",choose one of [\"cosine\", \"dot\", \"l2-squared\", \"manhattan\",\"hamming\"]")
    assert(err("""{"class": "Doc", "invertedIndexConfig": {"stopwords": {"preset": "de"}}}""")
      == "preset \"de\" not known to stopword detector")
    assert(err("""{"class": "Doc", "vectorIndexConfig": {"distance": "cosine"},
      |  "vectorConfig": {"v": {}}}""".stripMargin)
      == "creating a class with both a class level vector index and named vectors is forbidden")
    assert(err("""{"class": "Doc", "multiTenancyConfig": {"enabled": true}}""")
      == "class Doc: multiTenancyConfig.enabled requires a tenantColumn binding in this engine")
  }

  test("a decoded schema registers and serves a live query") {
    val dir = "/root/testdata/sf0.001"
    val gg = new graft.engine.Graft(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val schema = SchemaWire.decodeClass(
      """{"class": "WireDoc", "properties": [
        |  {"name": "text", "dataType": ["text"], "tokenization": "word"},
        |  {"name": "lang", "dataType": ["text"], "tokenization": "field"},
        |  {"name": "n_chars", "dataType": ["int"]}]}""".stripMargin,
      idColumn = "doc_id")
    gg.register(schema, docs.select("doc_id", "text", "lang", "n_chars"))
    val page = gg.get(GetParams("WireDoc",
      where = Some(Where.eqText("lang", "en")),
      properties = Seq("doc_id"),
      pagination = Some(Pagination(limit = 10000))))
    val expected = docs.filter(docs("lang") === "en").count()
    assert(page.count() == expected && expected > 0)
  }
}
