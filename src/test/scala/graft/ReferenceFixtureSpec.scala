package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.engine.GraphQL
import graft.model._
import graft.sources.SchemaWire

/**
 * Replays the reference's OWN acceptance fixtures through the wire
 * decoders — the schema documents under
 * test/acceptance/graphql_resolvers/fixtures/ are genuine weaviate class
 * JSON authored by the reference project, so decoding them end-to-end
 * (schema wire → register → GraphQL query wire → result) is the strongest
 * fidelity evidence available without a running weaviate.
 *
 * Guarded by `assume`: the suite stays green where the read-only reference
 * checkout is absent.
 */
class ReferenceFixtureSpec extends SparkSpecBase {

  private val fixtureDir = "/root/reference/test/acceptance/graphql_resolvers/fixtures"
  private def fixture(name: String): String = {
    val f = new java.io.File(s"$fixtureDir/$name")
    assume(f.exists(), s"reference fixtures not available at $fixtureDir")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  private def classes(json: String): Seq[(String, String)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    (JsonMethods.parse(json) \ "classes") match {
      case JArray(cs) => cs.map { c =>
        val JString(name) = (c \ "class"): @unchecked
        (name, JsonMethods.compact(JsonMethods.render(c)))
      }
      case _ => Nil
    }
  }

  test("every fixture class decodes (incl. multi-class refs)") {
    val things = classes(fixture("things_schema.json"))
    val actions = classes(fixture("actions_schema.json"))
    val all = things ++ actions
    assert(all.size >= 7)
    val known = all.map(_._1).toSet
    val decoded = all.map { case (_, json) =>
      SchemaWire.decodeClass(json, idColumn = "id", knownClasses = known)
    }
    assert(decoded.size == all.size)

    // multi-class refs (MultipleRef) decode with every target kept:
    // Airline.basedIn and BuyAction.salesPerson were this engine's last
    // data-model divergence — closed in r14
    val airline = decoded.find(_.name == "Airline").get
    val basedIn = airline.property("basedIn").get
    assert(basedIn.dataType == PropType.Ref)
    assert(basedIn.refTarget.isEmpty && basedIn.isMultiRef)
    val buyAction = decoded.find(_.name == "BuyAction").get
    val sales = buyAction.property("salesPerson").get
    assert(sales.dataType == PropType.Ref && sales.isMultiRef)

    // spot-check the decoded City against the fixture's declared types,
    // including the v1.19 string→text(whitespace) migration
    val city = decoded.find(_.name == "City").get
    assert(city.property("name").contains(
      Property("name", PropType.Text, Tokenization.Whitespace)))
    assert(city.property("population").map(p => (p.dataType, p.indexSearchable))
      .contains((PropType.Int, false)))
    assert(city.property("isCapital").map(_.dataType).contains(PropType.Bool))
    assert(city.property("location").map(_.dataType).contains(PropType.Geo))
    assert(city.property("inCountry").map(p => (p.dataType, p.refTarget))
      .contains((PropType.Ref, Some("Country"))))

    val person = decoded.find(_.name == "Person").get
    assert(person.property("birthday").map(_.dataType).contains(PropType.Date))
    assert(person.property("livesIn").flatMap(_.refTarget).contains("City"))
  }

  test("fixture schema + fixture data + GraphQL document run end-to-end") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    val cityJson = classes(fixture("things_schema.json"))
      .find(_._1 == "City").get._2
    val known = classes(fixture("things_schema.json")).map(_._1).toSet
    val schema = SchemaWire.decodeClass(cityJson, idColumn = "uuid", knownClasses = known)

    // load the fixture's City objects (data.json is the acceptance loader's
    // nested form; project the City-owned scalar fields)
    val objs = (JsonMethods.parse(fixture("data.json")) \ "Objects") match {
      case JArray(xs) => xs.filter(o => (o \ "class") == JString("City"))
      case _ => Nil
    }
    assume(objs.nonEmpty)
    def s(o: JValue, f: String): String = o \ f match { case JString(v) => v; case _ => null }
    def l(o: JValue, f: String): java.lang.Long = o \ f match {
      case JInt(v) => Long.box(v.toLong); case JLong(v) => Long.box(v); case _ => null
    }
    def b(o: JValue, f: String): java.lang.Boolean = o \ f match {
      case JBool(v) => Boolean.box(v); case _ => null
    }
    val rows = objs.map(o => Row(s(o, "uuid"), s(o, "name"), l(o, "population"),
      b(o, "isCapital"), s(o, "reviews")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("uuid", StringType), StructField("name", StringType),
        StructField("population", LongType), StructField("isCapital", BooleanType),
        StructField("reviews", StringType))))

    val gg = new graft.engine.Graft(spark)
    // the fixture declares inCountry (ref) and location (geo), which the
    // flat City projection doesn't carry — register the carried subset
    gg.register(schema.copy(properties =
      schema.properties.filter(p => df.columns.contains(p.name))), df)

    val page = gg.get(GraphQL.get(gg,
      """{ Get { City(
        |    where: {operator: And, operands: [
        |      {operator: GreaterThan, path: ["population"], valueInt: 1000000},
        |      {operator: Equal, path: ["isCapital"], valueBoolean: true}]},
        |    sort: [{path: ["name"], order: asc}], limit: 10
        |  ) { name population } } }""".stripMargin))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(page.toSeq == Seq(("Amsterdam", 1800000L), ("Berlin", 3470000L)))
  }
}
