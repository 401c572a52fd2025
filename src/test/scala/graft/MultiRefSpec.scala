package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{Graft, GraphQL}
import graft.model._
import graft.sources.SchemaWire

/**
 * Multi-class cross-references (reference: entities/models MultipleRef,
 * multi-entry dataType in entities/schema/data_types.go; regression
 * test/acceptance/graphql_resolvers/multi_reftype_bug_test.go). The
 * acceptance arms live in q_fixture_multiref; this spec covers the engine
 * semantics the Go test does not reach: class-qualified beacons, shadowed
 * uuids across target classes, ref-path filter dispatch per class,
 * pointingTo, and validation errors.
 */
class MultiRefSpec extends SparkSpecBase {

  private val T1 = "10000000-0000-0000-0000-000000000001"
  private val T2 = "20000000-0000-0000-0000-000000000002"
  private val Shared = "33000000-0000-0000-0000-000000000003" // uuid present in BOTH classes

  private def bed(): Graft = {
    val s = spark
    val g = new Graft(s)
    val targetType = StructType(Seq(StructField("uuid", StringType),
      StructField("name", StringType), StructField("rank", LongType)))
    g.register(CollectionSchema("RefA", "uuid", Seq(
      Property("name", PropType.Text), Property("rank", PropType.Int))),
      s.createDataFrame(s.sparkContext.parallelize(Seq(
        Row(T1, "alpha", 1L), Row(Shared, "shared-a", 7L)), 1), targetType))
    g.register(CollectionSchema("RefB", "uuid", Seq(
      Property("name", PropType.Text), Property("rank", PropType.Int))),
      s.createDataFrame(s.sparkContext.parallelize(Seq(
        Row(T2, "beta", 2L), Row(Shared, "shared-b", 9L)), 1), targetType))
    val srcType = StructType(Seq(StructField("uuid", StringType),
      StructField("name", StringType),
      StructField("links", ArrayType(StringType))))
    g.register(CollectionSchema("RefSrc", "uuid", Seq(
      Property("name", PropType.Text),
      Property("links", PropType.Ref, refTargets = Seq("RefA", "RefB")))),
      s.createDataFrame(s.sparkContext.parallelize(Seq(
        // class-qualified beacons pin the class even for the shared uuid
        Row("00000000-0000-0000-0000-0000000000a1", "src-qualified",
          Seq(s"weaviate://localhost/RefA/$Shared")),
        // short beacon of a shared uuid resolves in EVERY requested class
        Row("00000000-0000-0000-0000-0000000000a2", "src-short-shared",
          Seq(s"weaviate://localhost/$Shared")),
        Row("00000000-0000-0000-0000-0000000000a3", "src-mixed",
          Seq(s"weaviate://localhost/RefB/$T2", s"weaviate://localhost/$T1")),
        Row("00000000-0000-0000-0000-0000000000a4", "src-none", null)), 1), srcType))
    g
  }

  private def resolvedNames(g: Graft, doc: String): Map[String, String] =
    g.get(GraphQL.get(g, doc))
      .select(col("name"), col("links_resolved")).collect().map { r =>
        val v = if (r.isNullAt(1)) "∅"
          else r.getSeq[Row](1).map(h =>
            s"${h.getAs[String]("_refclass")}/${h.getAs[String]("name")}").mkString("|")
        r.getString(0) -> v
      }.toMap

  test("class-qualified beacon resolves ONLY in its own class") {
    val g = bed()
    val m = resolvedNames(g,
      """{ Get { RefSrc { name links { ... on RefA { name } ... on RefB { name } } } } }""")
    assert(m("src-qualified") == "RefA/shared-a")
    // short-form shared uuid: a hit in each requested class
    assert(m("src-short-shared").split('|').toSet == Set("RefA/shared-a", "RefB/shared-b"))
    assert(m("src-none") == "∅")
    // mixed: edge order preserved (qualified B-edge first, then short A-edge)
    assert(m("src-mixed") == "RefB/beta|RefA/alpha")
  }

  test("fragment scope prunes to the named class") {
    val g = bed()
    val m = resolvedNames(g,
      """{ Get { RefSrc { name links { ... on RefB { name } } } } }""")
    assert(m("src-qualified") == "∅")      // RefA-qualified edge out of scope
    assert(m("src-short-shared") == "RefB/shared-b")
    assert(m("src-mixed") == "RefB/beta")
  }

  test("a fragment on a non-linked class errors") {
    val g = bed()
    val e = intercept[IllegalArgumentException] {
      g.get(GraphQL.get(g,
        """{ Get { RefSrc { name links { ... on RefSrc { name } } } } }"""))
    }
    assert(e.getMessage.contains("is not a linked class of property 'links'"))
  }

  test("ref-path filters dispatch on the path's class segment") {
    val g = bed()
    def names(where: String): Set[String] =
      g.get(GraphQL.get(g,
        s"""{ Get { RefSrc(where: $where) { name } } }"""))
        .collect().map(_.getString(0)).toSet
    // path through RefA: shared-a rank 7 — qualified + short-shared match
    assert(names("""{path: ["links", "RefA", "rank"], operator: GreaterThan, valueInt: 5}""")
      == Set("src-qualified", "src-short-shared"))
    // the same value filter through RefB matches only genuine RefB edges
    assert(names("""{path: ["links", "RefB", "rank"], operator: GreaterThan, valueInt: 5}""")
      == Set("src-short-shared"))
    assert(names("""{path: ["links", "RefB", "name"], operator: Equal, valueText: "beta"}""")
      == Set("src-mixed"))
    // a class outside the declared targets errors
    val e = intercept[IllegalArgumentException] {
      names("""{path: ["links", "RefSrc", "name"], operator: Equal, valueText: "x"}""")
    }
    assert(e.getMessage.contains("is not a linked class of property 'links'"))
  }

  test("ref count (bare valueInt) counts edges regardless of class") {
    val g = bed()
    val hits = g.get(GraphQL.get(g,
      """{ Get { RefSrc(where: {path: ["links"], operator: Equal, valueInt: 2}) { name } } }"""))
      .collect().map(_.getString(0)).toSet
    assert(hits == Set("src-mixed"))
  }

  test("pointingTo lists every target class") {
    val g = bed()
    val row = graft.operators.Aggregations.typeInfo(g.collection("RefSrc"))
      .filter(col("property") === "links").collect().head
    assert(row.getString(2) == "RefA,RefB")
  }

  test("multi-ref resolution plans as an equi-keyed hash join, never BNLJ") {
    // the class-match predicate must ride the uuid hash join as a filter —
    // if Catalyst fails to extract the equi key, the union lookup degrades
    // to a nested-loop join that goes O(N*M) at 100 TB
    val g = bed()
    val plan = g.get(GraphQL.get(g,
      """{ Get { RefSrc { name links { ... on RefA { name } ... on RefB { name } } } } }"""))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"scale-hostile multi-ref plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"))
  }

  test("schema wire round-trips multi-class refs through backup manifests") {
    val g = bed()
    val dir = java.nio.file.Files.createTempDirectory("multiref-backup").toString
    graft.sources.Backup.exportCollection(g.collection("RefSrc"), s"$dir/RefSrc")
    val restored = graft.sources.Backup.restoreCollection(spark, s"$dir/RefSrc")
    val p = restored.schema.property("links").get
    assert(p.isMultiRef && p.allRefTargets == Seq("RefA", "RefB"))
  }
}
