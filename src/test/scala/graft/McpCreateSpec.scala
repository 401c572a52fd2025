package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.engine.{Graft, McpCreate, McpRead}
import graft.model._
import graft.sources.CollectionStore

/**
 * MCP objects-upsert tool unit pins (adapters/handlers/mcp/create/
 * objects_upsert.go): the function-level vs per-item error split — an
 * empty batch and a malformed uuid THROW before any write (lines 58, 84),
 * everything else rides the result list per item — plus the shared
 * write-path vector guard (validateVectorWrite: no-configuration vs
 * dropped-marker texts) and the read tools.
 */
class McpCreateSpec extends SparkSpecBase {

  private def world(): (Graft, CollectionStore) = {
    val g = new Graft(spark)
    val schema = CollectionSchema("Paragraph", "uuid", Seq(
      Property("contents", PropType.Text), Property("title", PropType.Text)),
      vectors = Map("default" -> "vec"), defaultVector = Some("default"))
    val st = new CollectionStore(spark,
      java.nio.file.Files.createTempDirectory("graft-mcpspec").toString, schema)
    st.init(spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("uuid", StringType),
        StructField("contents", StringType), StructField("title", StringType),
        StructField("vec", ArrayType(FloatType))))))
    g.register(schema, st.read())
    (g, st)
  }
  private def call(g: Graft, st: CollectionStore, json: String) = {
    var n = 0
    McpCreate.upsertObjects(g, json,
      c => Some(st).filter(_ => c == "Paragraph"),
      () => { n += 1; f"0dcc0000-0000-4000-8000-$n%012d" })
  }

  test("empty batch and malformed uuid throw at the function level") {
    val (g, st) = world()
    val e1 = intercept[IllegalArgumentException](call(g, st,
      """{"collection_name": "Paragraph", "objects": []}"""))
    assert(e1.getMessage === "at least one object is required")
    val e2 = intercept[IllegalArgumentException](call(g, st,
      """{"collection_name": "Paragraph", "objects": [
           {"uuid": "not-a-valid-uuid", "properties": {"title": "x"}}]}"""))
    assert(e2.getMessage === "invalid UUID for object")
  }

  test("unknown collection is a PER-ITEM error for every object") {
    val (g, st) = world()
    val rs = call(g, st, """{"collection_name": "Nope", "objects": [
      {"properties": {"title": "a"}}, {"properties": {"title": "b"}}]}""")
    assert(rs.size == 2)
    assert(rs.forall(_.error == "class 'Nope' not present in schema"))
  }

  test("partial batch: bad item errors, good items write and get ids") {
    val (g, st) = world()
    val rs = call(g, st, """{"collection_name": "Paragraph", "objects": [
      {"properties": {"contents": "ok one"}},
      {"properties": {"contents": 7}},
      {"properties": {"contents": "ok two"}}]}""")
    assert(rs.map(_.error.isEmpty) == Seq(true, false, true))
    assert(rs(1).error.startsWith("invalid object: invalid text property 'contents'"))
    assert(st.read().count() === 2)
  }

  test("vector guard: unconfigured space per-item; dropped marker rejected") {
    val (g, st) = world()
    val rs = call(g, st, """{"collection_name": "Paragraph", "objects": [
      {"properties": {"contents": "x"}, "vectors": {"ghost": [0.1]}}]}""")
    assert(rs.head.error ===
      "collection Paragraph does not have configuration for vector ghost")
    // the dropped-marker arm goes through validateVectorWrite directly on a
    // marked MT class (the only deferred-drop state this engine holds)
    val g2 = new Graft(spark)
    g2.register(CollectionSchema("MT", "uuid", Nil, tenantColumn = Some("t"),
      vectors = Map("v" -> "vc")),
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("00000000-0000-4000-8000-000000000001", Seq(0.1f), "t1"),
        Row("00000000-0000-4000-8000-000000000002", Seq(0.2f), "t2")), 1),
        StructType(Seq(StructField("uuid", StringType),
          StructField("vc", ArrayType(FloatType)), StructField("t", StringType)))))
    g2.addTenants("MT", Seq(Tenant("t1"), Tenant("t2")))
    g2.updateTenant("MT", "t2", TenantStatus.Inactive)
    g2.dropVectorIndex("MT", "v")
    val e = intercept[IllegalArgumentException](g2.validateVectorWrite("MT", Seq("v")))
    assert(e.getMessage ===
      "vector index for v was dropped; writes targeting it are rejected")
  }

  test("read tools list classes and tenants") {
    val (g, _) = world()
    assert(McpRead.getConfig(g, None) == Seq("Paragraph"))
    assert(McpRead.getConfig(g, Some("Paragraph")) == Seq("Paragraph"))
    g.register(CollectionSchema("MTT", "uuid", Nil, tenantColumn = Some("t")),
      g.collection("Paragraph").df.limit(0)
        .selectExpr("uuid", "contents as t"))
    g.addTenants("MTT", Seq(Tenant("a"), Tenant("b")))
    assert(McpRead.listTenants(g, "MTT").sortBy(_._1) ==
      Seq("a" -> "ACTIVE", "b" -> "ACTIVE"))
  }
}
