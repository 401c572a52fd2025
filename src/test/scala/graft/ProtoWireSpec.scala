package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.engine.{GraphQL, ProtoWire, WireDecoder}

/**
 * Binary protobuf wire format: the reader proven against INDEPENDENTLY
 * hand-authored byte sequences (from the public protobuf encoding spec, not
 * ProtoWire's own writer), writer/reader round-trips, and byte-transport ↔
 * protojson-transport decode equivalence on a real SearchRequest.
 */
class ProtoWireSpec extends SparkSpecBase {

  private lazy val g = Fixtures.graft(spark, "/root/testdata/sf0.001")

  test("reader decodes hand-authored bytes (encoding-spec fixtures)") {
    // SearchRequest{collection: "Region", limit: 3}
    //   field 1 (string): tag 0x0A, len 6, "Region"
    //   field 30 (uint32): tag = 30<<3 | 0 = 240 → varint F0 01, value 3
    val bytes = Array[Int](
      0x0A, 0x06, 'R', 'e', 'g', 'i', 'o', 'n',
      0xF0, 0x01, 0x03).map(_.toByte)
    assert(ProtoWire.read(bytes, "SearchRequest") == JObject(List(
      "collection" -> JString("Region"), "limit" -> JLong(3))))

    // Filters{operator: OPERATOR_EQUAL(1), value_int: 300, target{property: "n"}}
    //   field 1 varint: 08 01; field 5 varint (int64 300): 28 AC 02
    //   field 20 msg: tag = 20<<3|2 = 162 → varint A2 01, len 3, inner:
    //     field 1 string: 0A 01 'n'
    val filters = Array[Int](
      0x08, 0x01, 0x28, 0xAC, 0x02,
      0xA2, 0x01, 0x03, 0x0A, 0x01, 'n').map(_.toByte)
    assert(ProtoWire.read(filters, "Filters") == JObject(List(
      "operator" -> JString("OPERATOR_EQUAL"),
      "value_int" -> JLong(300),
      "target" -> JObject(List("property" -> JString("n"))))))

    // packed repeated float (Hybrid.vector field 3): tag 0x1A, len 8,
    // two LE fp32 (1.0 = 00 00 80 3F, -2.5 = 00 00 20 C0)
    val packed = Array[Int](
      0x1A, 0x08, 0x00, 0x00, 0x80, 0x3F, 0x00, 0x00, 0x20, 0xC0).map(_.toByte)
    assert(ProtoWire.read(packed, "Hybrid") == JObject(List(
      "vector" -> JArray(List(JDouble(1.0), JDouble(-2.5))))))

    // UNPACKED repeated scalar must also parse (proto2-style encoders)
    val unpacked = Array[Int](
      0x1D, 0x00, 0x00, 0x80, 0x3F, 0x1D, 0x00, 0x00, 0x20, 0xC0).map(_.toByte)
    assert(ProtoWire.read(unpacked, "Hybrid") == JObject(List(
      "vector" -> JArray(List(JDouble(1.0), JDouble(-2.5))))))

    // unknown fields skip cleanly (forward compatibility): field 99 varint
    // (99<<3|0 = 792 → varint 98 06, value 42) then tenant (field 10,
    // tag 10<<3|2 = 0x52)
    val unknown = Array[Int](0x98, 0x06, 0x2A, 0x52, 0x01, 'x').map(_.toByte)
    assert(ProtoWire.read(unknown, "SearchRequest") == JObject(List(
      "tenant" -> JString("x"))))
  }

  test("writer/reader round-trip a full SearchRequest") {
    val doc = JsonMethods.parse(
      """{"collection": "DocVec",
        |  "filters": {"operator": "OPERATOR_OR", "filters": [
        |    {"operator": "OPERATOR_CONTAINS_ANY", "target": {"property": "lang"},
        |     "value_text_array": {"values": ["en", "de"]}},
        |    {"operator": "OPERATOR_IS_NULL", "target": {"property": "source"}, "value_boolean": true}]},
        |  "limit": 12, "offset": 2, "autocut": 1,
        |  "sort_by": [{"ascending": true, "path": ["doc_id"]}],
        |  "metadata": {"uuid": true, "score": true},
        |  "hybrid_search": {"query": "spark join", "alpha": 0.5,
        |    "fusion_type": "FUSION_TYPE_RANKED", "vector": [0.25, -1.5],
        |    "targets": {"target_vectors": ["default"],
        |      "combination": "COMBINATION_METHOD_TYPE_SUM",
        |      "weights_for_targets": [{"target": "default", "weight": 0.75}]}}}""".stripMargin)
    val round = ProtoWire.read(ProtoWire.write(doc, "SearchRequest"), "SearchRequest")
    // ints come back as JLong; floats as JDouble — normalize the source
    def norm(j: JValue): JValue = j match {
      case JInt(i) => JLong(i.toLong)
      case JArray(xs) => JArray(xs.map(norm))
      case JObject(fs) => JObject(fs.map { case (k, v) => k -> norm(v) })
      case o => o
    }
    assert(round == norm(doc))
  }

  test("binary transport decodes to the same GetParams as protojson") {
    val json =
      """{"collection": "Lineitem",
        |  "filters": {"operator": "OPERATOR_AND", "filters": [
        |    {"operator": "OPERATOR_EQUAL", "target": {"property": "l_returnflag"}, "value_text": "R"},
        |    {"operator": "OPERATOR_GREATER_THAN", "target": {"property": "l_quantity"}, "value_number": 30.0}]},
        |  "limit": 50,
        |  "properties": {"non_ref_properties": ["l_orderkey"]}}""".stripMargin
    val viaJson = WireDecoder.search(g, json)
    val viaBytes = ProtoWire.searchRequest(g,
      ProtoWire.write(JsonMethods.parse(json), "SearchRequest"))
    assert(viaBytes == viaJson)
  }

  test("map fields (vector_per_target) and vector_bytes round-trip") {
    val vec = Array(1.5f, -0.25f)
    val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vec.foreach(bb.putFloat)
    val b64 = java.util.Base64.getEncoder.encodeToString(bb.array())
    val doc = JObject(List(
      "certainty" -> JDouble(0.8),
      "vector_per_target" -> JObject(List("default" -> JString(b64)))))
    val round = ProtoWire.read(ProtoWire.write(doc, "NearVector"), "NearVector")
    assert(round == doc)
  }

  test("AggregateRequest bytes decode (hand-authored fixture + twin equivalence)") {
    // AggregateRequest{collection: "Order"(field 1), objects_count: true
    // (field 20 → tag 20<<3|0 = 160 → A0 01), aggregations[0] (field 21 →
    // tag 21<<3|2 = 170 → AA 01): Aggregation{property: "o_totalprice"
    // (0A 0C ...), number (field 3, tag 1A): {count(08 01) mean(20 01)}}
    val bytes = Array[Int](
      0x0A, 0x05, 'O', 'r', 'd', 'e', 'r',
      0xA0, 0x01, 0x01,
      0xAA, 0x01, 0x14,
      0x0A, 0x0C) .map(_.toByte) ++
      "o_totalprice".getBytes("UTF-8") ++
      Array[Int](0x1A, 0x04, 0x08, 0x01, 0x20, 0x01).map(_.toByte)
    assert(ProtoWire.read(bytes, "AggregateRequest") == JObject(List(
      "collection" -> JString("Order"),
      "objects_count" -> JBool(true),
      "aggregations" -> JArray(List(JObject(List(
        "property" -> JString("o_totalprice"),
        "number" -> JObject(List("count" -> JBool(true), "mean" -> JBool(true))))))))))
    // byte transport lands on the same AggregateParams as protojson
    val json =
      """{"collection": "Order", "objectsCount": true,
        |  "aggregations": [{"property": "o_totalprice",
        |    "number": {"count": true, "mean": true}}]}""".stripMargin
    assert(ProtoWire.aggregateRequest(g, bytes) == WireDecoder.aggregate(g, json))
  }

  test("google.protobuf.Struct payload in BatchObject round-trips") {
    // Struct{"a": number 1.5, "s": string "x", "b": bool true,
    //        "l": list[2.0, "y"], "o": {"k": null}}
    val doc = JObject(List("objects" -> JArray(List(JObject(List(
      "collection" -> JString("C"),
      "uuid" -> JString("00000000-0000-0000-0000-000000000001"),
      "properties" -> JObject(List(
        "non_ref_properties" -> JObject(List(
          "a" -> JDouble(1.5), "s" -> JString("x"), "b" -> JBool(true),
          "l" -> JArray(List(JDouble(2.0), JString("y"))),
          "o" -> JObject(List("k" -> JNull))))))))))))
    val round = ProtoWire.read(
      ProtoWire.write(doc, "BatchObjectsRequest"), "BatchObjectsRequest")
    assert(round == doc)
    // through the decoder: the Struct is scalars-only there (arrays travel
    // in the typed *ArrayProperties messages — batch.proto) → per-index error
    val (_, errs) = ProtoWire.batchObjectsRequest(
      ProtoWire.write(doc, "BatchObjectsRequest"))
    assert(errs(0).contains("nonRefProperties.l"))
    // scalars-only Struct decodes clean
    val scalarDoc = JObject(List("objects" -> JArray(List(JObject(List(
      "collection" -> JString("C"),
      "uuid" -> JString("00000000-0000-0000-0000-000000000001"),
      "properties" -> JObject(List(
        "non_ref_properties" -> JObject(List(
          "a" -> JDouble(1.5), "s" -> JString("x"), "b" -> JBool(true)))))))))))
    val (ok2, errs2) = ProtoWire.batchObjectsRequest(
      ProtoWire.write(scalarDoc, "BatchObjectsRequest"))
    assert(errs2.isEmpty && ok2.size == 1)
    assert(ok2.head._2.properties("a") == 1.5)
    assert(ok2.head._2.properties("s") == "x")
  }

  test("SearchReply bytes: typed Properties values round-trip every kind") {
    // one result carrying a text/int/double/bool/text[]/int[]/number[]/
    // bool[]/nested-object payload — every Value oneof arm the engine emits
    val nonRef = JObject(List(
      "t" -> JString("hello"), "i" -> JLong(42), "d" -> JDouble(2.25),
      "b" -> JBool(false),
      "ts" -> JArray(List(JString("a"), JString("b"))),
      "is" -> JArray(List(JLong(1), JLong(-2))),
      "ds" -> JArray(List(JDouble(0.5), JDouble(1.5))),
      "bs" -> JArray(List(JBool(true), JBool(false))),
      "obj" -> JObject(List("inner" -> JString("v")))))
    val result = JObject(List(
      "properties" -> JObject(List("nonRefProperties" -> nonRef)),
      "metadata" -> JObject(List(
        "id" -> JString("00000000-0000-0000-0000-000000000002"),
        "distance" -> JDouble(0.25), "distancePresent" -> JBool(true)))))
    val reply = JObject(List(
      "took" -> JDouble(0.5),
      "results" -> JArray(List(result))))
    val bytes = ProtoWire.write(reply, "SearchReply")
    val back = ProtoWire.read(bytes, "SearchReply")
    val props = back \\ "non_ref_properties"
    assert((props \ "t") == JString("hello"))
    assert((props \ "i") == JLong(42))
    assert((props \ "d") == JDouble(2.25))
    assert((props \ "b") == JBool(false))
    assert((props \ "ts") == JArray(List(JString("a"), JString("b"))))
    assert((props \ "is") == JArray(List(JLong(1), JLong(-2))))
    assert((props \ "ds") == JArray(List(JDouble(0.5), JDouble(1.5))))
    assert((props \ "bs") == JArray(List(JBool(true), JBool(false))))
    assert((props \ "obj") == JObject(List("inner" -> JString("v"))))
    val md = back \\ "metadata"
    assert((md \ "id") == JString("00000000-0000-0000-0000-000000000002"))
    assert((md \ "distance_present") == JBool(true))
    assert((back \ "took") == JDouble(0.5))
  }
}
