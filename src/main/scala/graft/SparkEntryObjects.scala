package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.engine.{Graft, WireDecoder}
import graft.model._
import graft.sources.AutoSchema

/**
 * q_fixture_objects* gates: the objects/ REST acceptance journeys
 * (test/acceptance/objects/auto_schema_test.go, setup_test.go's
 * autoSchemaObjects, rapid_updates_add_reference_test.go) replayed as
 * composed walks — every create goes through the REST object decode
 * (WireDecoder.decodeRestObject + restObjectValues) and the auto-schema
 * inference (AutoSchema.mergeRestObject), references through the store's
 * write path, and the assertions are the suites' own (schema dumps after
 * evolution, beacon sets after rapid reference churn).
 */
object SparkEntryObjects {

  private def steps(s: SparkSession, rows: Seq[(String, String)]): DataFrame = {
    import s.implicits._
    rows.toDF("step", "result").orderBy(col("step"))
  }

  /** A tiny auto-schema world: classes evolve per create like the
   * reference's AutoSchemaManager; objects accumulate per class. */
  private final class AutoSchemaWorld {
    var schemas = Map.empty[String, CollectionSchema]
    var objects = Map.empty[String, Vector[(String, Map[String, Any])]] // class → (id, props)
    private var counter = 0

    private def classOfId(id: String): Option[String] =
      objects.collectFirst { case (cls, objs) if objs.exists(_._1 == id) => cls }

    /** ObjectsCreate: auto-schema merge, then value typing + store. */
    def create(json: String): String = {
      val o = WireDecoder.decodeRestObject(json)
      val merged = AutoSchema.mergeRestObject(
        schemas.get(o.collection), o.collection, "uuid", o.properties, classOfId)
      schemas += o.collection -> merged
      val id = o.id.getOrElse { counter += 1; f"0df00000-0000-4000-8000-$counter%012d" }
      val values = WireDecoder.restObjectValues(merged, o)
      objects += o.collection ->
        (objects.getOrElse(o.collection, Vector.empty) :+ (id, values))
      id
    }

    def deleteClass(cls: String): Unit = {
      schemas -= cls; objects -= cls
    }

    /** SchemaDump shape: the class's properties as name:type, name-sorted.
     * Ref props render their target class list like the REST schema. */
    def dumpClass(cls: String): String =
      schemas.get(cls).map(_.properties.sortBy(_.name).map { p =>
        val t = p.dataType match {
          case PropType.Ref =>
            (p.refTarget.toSeq ++ p.refTargets).distinct.mkString("&")
          case other => other.name
        }
        s"${p.name}:$t"
      }.mkString(",")).getOrElse("∅")
  }

  private def grpcObjectsGate(s: SparkSession): DataFrame = {
    val out = Seq.newBuilder[(String, String)]

    // -- TestAutoSchemaWithDifferentProperties: both casings land lowercased
    Seq("Upper" -> Seq("NonExistingProperty", "OtherNonExistingProperty"),
        "lower" -> Seq("nonExistingProperty", "otherNonExistingProperty"))
      .foreach { case (key, names) =>
        val w = new AutoSchemaWorld
        names.foreach { n =>
          w.create(s"""{"class": "RandomName234234", "properties": {"$n": "test"}}""")
        }
        out += s"o1_${key}" -> w.dumpClass("RandomName234234")
        w.deleteClass("RandomName234234")
      }

    // -- autoSchemaObjects (setup_test.go): the full typed payload creates
    //    an unseen class; unseen props extend an existing one; beacon
    //    arrays become cross-refs targeting the pointed objects' classes
    val w = new AutoSchemaWorld
    w.create("""{
      "class": "NonExistingClass", "id": "8e2997f2-1972-4ee2-ad35-5fc704f2893e",
      "properties": {
        "testString": "test", "testNumber": 1,
        "testDate": "2002-10-02T15:00:00Z", "testBoolean": true,
        "testGeoCoordinates": {"latitude": 1.01, "longitude": 1.01},
        "testPhoneNumber": {"input": "020 1234567", "defaultCountry": "nl"},
        "textArray": ["a", "b", "c"], "intArray": [1, 2, 3],
        "numberArray": [11.0, 22.0, 33.0]}}""")
    out += "o2_new_class" -> w.dumpClass("NonExistingClass")

    w.create("""{"class": "TestObject", "properties": {"nonExistingProperty": "test"}}""")
    out += "o3_new_prop" -> w.dumpClass("TestObject")
    w.create("""{
      "class": "TestObject", "id": "8e2997f2-1972-4ee2-ad35-5fc704f2893f",
      "properties": {
        "nonExistingDateProperty": "2002-10-02T15:00:00Z",
        "nonExistingNumberProperty": 1}}""")
    out += "o4_typed_props" -> w.dumpClass("TestObject")

    w.create("""{"class": "TestObject", "properties": {
      "hasNonExistingClass": [
        {"beacon": "weaviate://localhost/8e2997f2-1972-4ee2-ad35-5fc704f2893e"}]}}""")
    w.create("""{"class": "TestObject", "properties": {
      "hasNonExistingClassAndTestObject": [
        {"beacon": "weaviate://localhost/8e2997f2-1972-4ee2-ad35-5fc704f2893e"},
        {"beacon": "weaviate://localhost/8e2997f2-1972-4ee2-ad35-5fc704f2893f"}]}}""")
    out += "o5_cross_refs" -> w.dumpClass("TestObject")

    // -- Test_RapidlyAddingReferences: 10 sequential single-reference POSTs
    //    against one source object, each a full store write — the write-
    //    serialization contract is that NO edge is lost
    val sourceId = "96ce03ca-58ed-48e1-a0f1-51f63fa9aa12"
    val targetIds = Seq(
      "ce1a4756-b7ce-44fa-b079-45a7ec400882", "e1edb4ff-570c-4f0b-a1a1-18af118369aa",
      "25d22c70-3df0-4e5c-b8c1-a88d4d2771ef", "6f2a0708-3e8e-4a68-9763-26c465d8bf83",
      "c4dfae47-ebcf-4808-9122-1c67898ec140", "754bd925-1900-4f93-9f5d-27631eb618bb",
      "babba820-e3f5-4e8d-a354-76f2cb13fdba", "270942da-1999-40cd-a580-a91aa144b6c0",
      "a7a06618-6d50-4654-be75-2c9f639a6368", "47ba1d2b-6b8c-4b3b-92a8-46574a069ae8")
    val srcSchema = CollectionSchema("SequenceReferenceTestSource", "uuid", Seq(
      Property("toTarget", PropType.Ref, refTarget = Some("SequenceReferenceTestTarget")),
      Property("name", PropType.Text, Tokenization.Whitespace)))
    val tgtSchema = CollectionSchema("SequenceReferenceTestTarget", "uuid", Seq(
      Property("name", PropType.Text, Tokenization.Whitespace)))
    val srcStore = new graft.sources.CollectionStore(s,
      java.nio.file.Files.createTempDirectory("graft-seq-src").toString, srcSchema)
    srcStore.init(s.createDataFrame(s.sparkContext.parallelize(Seq(
      Row(sourceId, null, "Source Object")), 1),
      StructType(Seq(StructField("uuid", StringType),
        StructField("toTarget", ArrayType(StringType)),
        StructField("name", StringType)))))
    val tgtStore = new graft.sources.CollectionStore(s,
      java.nio.file.Files.createTempDirectory("graft-seq-tgt").toString, tgtSchema)
    tgtStore.init(s.createDataFrame(
      s.sparkContext.parallelize(targetIds.zipWithIndex.map { case (id, i) =>
        Row(id, s"target object $i") }, 1),
      StructType(Seq(StructField("uuid", StringType), StructField("name", StringType)))))
    import s.implicits._
    targetIds.foreach { tid =>
      // ObjectsReferencesCreate: one beacon per call, applied immediately
      srcStore.addReferences("toTarget", Seq((sourceId, tid)).toDF("uuid", "target"))
    }
    val found = srcStore.read().filter(col("uuid") === sourceId)
      .select(col("toTarget")).collect().head.getSeq[String](0)
    out += "r1_refs_set" -> (s"n=${found.size};" +
      s"all=${found.toSet == targetIds.toSet}")
    steps(s, out.result())
  }

  /** TestRefsWithoutToClass + TestRefsMultiTarget (crefs_test.go:104-296):
   * to-class detection when a SHORT beacon lands on a single-target ref
   * prop, PUT/DELETE reference semantics, and verbatim rendering on
   * multi-target props. */
  private def crefsGate(s: SparkSession): DataFrame = {
    import s.implicits._
    val out = Seq.newBuilder[(String, String)]
    def render(prop: Property, edges: Seq[String]): String =
      graft.engine.WireEncoder.refBeacons(prop, edges)
        .map { case (b, h) => s"$b|$h" }.mkString(",")

    val refToId = "0c1f0000-0000-4000-8000-000000000001"
    val refFromId = "0c1f0000-0000-4000-8000-000000000002"
    def store(name: String, refProp: Property): graft.sources.CollectionStore = {
      val sc = CollectionSchema(name, "uuid", Seq(refProp))
      val st = new graft.sources.CollectionStore(s,
        java.nio.file.Files.createTempDirectory(s"graft-cref-$name").toString, sc)
      st.init(s.createDataFrame(s.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField("uuid", StringType),
        StructField("ref", ArrayType(StringType))))))
      st
    }
    def edgesOf(st: graft.sources.CollectionStore, id: String): Seq[String] =
      st.read().filter(col("uuid") === id).select(col("ref")).collect()
        .headOption.map(r => if (r.isNullAt(0)) Nil else r.getSeq[String](0).sorted)
        .getOrElse(Nil)

    // -- single-target prop: short beacons qualify with the declared class
    val singleProp = Property("ref", PropType.Ref, refTarget = Some("ReferenceTo"))
    val fromSt = store("ReferenceFrom", singleProp)
    fromSt.upsert(Seq((refFromId, null: Seq[String])).toDF("uuid", "ref"))
    // POST a short (class-less) beacon — stored as the bare uuid
    fromSt.addReferences("ref", Seq((refFromId, refToId)).toDF("uuid", "target"))
    out += "c1_post_short" -> render(singleProp, edgesOf(fromSt, refFromId))
    // PUT [short, qualified] — the reference reads back BOTH entries as the
    // qualified beacon; this store's cref lists are SET-valued (documented
    // divergence, CollectionStore.replaceReferences), so the two forms of
    // one edge collapse to a single qualified beacon
    fromSt.replaceReferences("ref", Seq(
      (refFromId, refToId), (refFromId, refToId)).toDF("uuid", "target"))
    out += "c2_put_two" -> render(singleProp, edgesOf(fromSt, refFromId))
    // DELETE the short form — every occurrence leaves; the list EMPTIES,
    // it does not null out
    fromSt.deleteReferences("ref", Seq((refFromId, refToId)).toDF("uuid", "target"))
    val after = fromSt.read().filter(col("uuid") === refFromId)
      .select(col("ref")).collect().head
    out += "c3_delete_empties" -> (if (after.isNullAt(0)) "null"
      else s"[${after.getSeq[String](0).mkString(",")}]")

    // -- multi-target prop (DataType [ReferenceTo, ReferenceFrom]): every
    //    posted form reads back VERBATIM (no detection)
    val multiProp = Property("ref", PropType.Ref,
      refTargets = Seq("ReferenceTo", "ReferenceFrom"))
    val multiSt = store("ReferenceFromMulti", multiProp)
    multiSt.upsert(Seq((refFromId, null: Seq[String])).toDF("uuid", "ref"))
    Seq("m1" -> refToId, "m2" -> s"ReferenceTo/$refToId",
        "m3" -> s"ReferenceFrom/$refFromId").foreach { case (key, form) =>
      multiSt.addReferences("ref", Seq((refFromId, form)).toDF("uuid", "target"))
      out += s"c4_${key}" -> render(multiProp, edgesOf(multiSt, refFromId))
      // PUT [] clears between cases (one (id, null) edge row = clearing PUT)
      multiSt.replaceReferences("ref",
        Seq((refFromId, null: String)).toDF("uuid", "target"))
    }
    steps(s, out.result())
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fixture_objects" -> ((s, _) => grpcObjectsGate(s)),
    "q_fixture_objects_crefs" -> ((s, _) => crefsGate(s)))

  def oracleSql: Map[String, String] = Map(
    // TestAutoSchemaWithDifferentProperties + autoSchemaObjects +
    // Test_RapidlyAddingReferences: lowercased property normalization, the
    // reference's inference defaults (json numbers → number, RFC3339 →
    // date, geo/phone maps, beacon arrays → refs targeting the pointed
    // objects' classes — two classes for the mixed-beacon prop), and the
    // no-edge-lost contract over 10 sequential reference POSTs
    "q_fixture_objects" ->
      """SELECT * FROM (VALUES
        |  ('o1_Upper', 'nonExistingProperty:text,otherNonExistingProperty:text'),
        |  ('o1_lower', 'nonExistingProperty:text,otherNonExistingProperty:text'),
        |  ('o2_new_class', 'intArray:number[],numberArray:number[],testBoolean:boolean,testDate:date,testGeoCoordinates:geoCoordinates,testNumber:number,testPhoneNumber:phoneNumber,testString:text,textArray:text[]'),
        |  ('o3_new_prop', 'nonExistingProperty:text'),
        |  ('o4_typed_props', 'nonExistingDateProperty:date,nonExistingNumberProperty:number,nonExistingProperty:text'),
        |  ('o5_cross_refs', 'hasNonExistingClass:NonExistingClass,hasNonExistingClassAndTestObject:NonExistingClass&TestObject,nonExistingDateProperty:date,nonExistingNumberProperty:number,nonExistingProperty:text'),
        |  ('r1_refs_set', 'n=10;all=true')
        |) AS t(step, result) ORDER BY step""".stripMargin,
    // TestRefsWithoutToClass + TestRefsMultiTarget: short beacons qualify
    // with the single-target prop's class on read-back; multi-target props
    // render verbatim; DELETE empties (never nulls) the list. c2 records
    // ONE qualified beacon where the reference shows the same beacon twice
    // — this store's cref lists are set-valued (documented divergence,
    // CollectionStore.replaceReferences)
    "q_fixture_objects_crefs" ->
      """SELECT * FROM (VALUES
        |  ('c1_post_short', 'weaviate://localhost/ReferenceTo/0c1f0000-0000-4000-8000-000000000001|/v1/objects/ReferenceTo/0c1f0000-0000-4000-8000-000000000001'),
        |  ('c2_put_two', 'weaviate://localhost/ReferenceTo/0c1f0000-0000-4000-8000-000000000001|/v1/objects/ReferenceTo/0c1f0000-0000-4000-8000-000000000001'),
        |  ('c3_delete_empties', '[]'),
        |  ('c4_m1', 'weaviate://localhost/0c1f0000-0000-4000-8000-000000000001|/v1/objects/0c1f0000-0000-4000-8000-000000000001'),
        |  ('c4_m2', 'weaviate://localhost/ReferenceTo/0c1f0000-0000-4000-8000-000000000001|/v1/objects/ReferenceTo/0c1f0000-0000-4000-8000-000000000001'),
        |  ('c4_m3', 'weaviate://localhost/ReferenceFrom/0c1f0000-0000-4000-8000-000000000002|/v1/objects/ReferenceFrom/0c1f0000-0000-4000-8000-000000000002')
        |) AS t(step, result) ORDER BY step""".stripMargin)
}
