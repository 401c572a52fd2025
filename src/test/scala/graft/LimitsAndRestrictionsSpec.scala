package graft

import org.apache.spark.sql.functions._

import graft.engine.{Graft, Namespaces, Restrictions, UsageLimits}
import graft.model._

/** Usage limits + config restrictions + the namespace-cleanup sweep
 * (reference: usecases/usagelimits, usecases/restrictions,
 * usecases/namespace_cleanup). The q_usage_limits / q_restrictions /
 * q_namespace_cleanup gates walk the scripted arms; these tests pin the
 * edges the script can't: unset caps, template fallback rules, registry
 * scrubbing after a sweep. */
class LimitsAndRestrictionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("usage limits: unset caps are unlimited; template rules") {
    // manager.go readLimit: nil → unlimited (NOT zero-allowed)
    UsageLimits.check(None, 1000000L, 1000000L, UsageLimits.LimitObjects)
    // boundary is strict >: current + n == cap passes
    UsageLimits.check(Some(10L), 7L, 3L, UsageLimits.LimitObjects)
    val e = intercept[UsageLimits.LimitExceeded](
      UsageLimits.check(Some(10L), 7L, 4L, UsageLimits.LimitObjects))
    assert(e.limit == "objects" && e.value == 10L)
    assert(e.getMessage == "objects count limit of 10 reached for this instance.")
    // empty template falls back to the default; foreign tokens pass through
    assert(UsageLimits.render("", UsageLimits.LimitTenants, 5) ==
      "tenants count limit of 5 reached for this instance.")
    assert(UsageLimits.render("{value}x {limit} {nope}", UsageLimits.LimitShards, 2) ==
      "2x shards {nope}")
  }

  test("restrictions: sorted allowed list, unconfigured passes, violation fields") {
    assert(Restrictions.render("", Restrictions.Compression, "rq", Seq("sq", "pq", "bq")) ==
      "rq is not allowed for compression. Allowed values: bq, pq, sq.")
    Restrictions.check(None, Restrictions.VectorIndexType, "anything")
    Restrictions.check(Some(Seq("ivf")), Restrictions.VectorIndexType, "ivf")
    val v = intercept[Restrictions.Violation](
      Restrictions.check(Some(Seq("flat")), Restrictions.VectorIndexType, "ivf"))
    assert(v.restriction == "vector_index_type" && v.value == "ivf")
    assert(v.allowed == Seq("flat"))
  }

  test("cleanup sweep scrubs every per-class registry; name is reusable after") {
    val docs = (0L until 20L).map(i => (i, s"t$i")).toDF("id", "tenant")
    val g = new Graft(spark)
    g.register(CollectionSchema("SweepMe", "id", Nil,
      tenantColumn = Some("tenant")), docs)
    g.addTenants("SweepMe", Seq(Tenant("t1")))
    g.namespaces.create("ns-x", "node-1", 1)
    g.assignNamespace("SweepMe", "ns-x")
    g.createAlias("SweepAlias", "SweepMe")
    g.namespaces.changeState("ns-x", Namespaces.State.Deleting, 2)
    val log = g.cleanupDeletingNamespaces()
    assert(log == Seq("alias:SweepAlias", "class:SweepMe", "namespace:ns-x"))
    assert(!g.hasCollection("SweepMe") && g.listAliases().isEmpty)
    // fresh registration of the same name carries NO stale tenant registry —
    // a leftover entry would gate the new collection on the old tenants
    g.register(CollectionSchema("SweepMe", "id", Nil,
      tenantColumn = Some("tenant")), docs)
    assert(g.tenants("SweepMe").isEmpty)
    assert(g.get(GetParams("SweepMe", tenant = Some("t7"))).count() == 1L)
    assert(g.cleanupDeletingNamespaces().isEmpty)
  }

  test("store object cap: count read lazily, merge/delete exempt") {
    val docs = (0L until 30L).map(i => (i, i * 10)).toDF("id", "v")
    val st = new graft.sources.CollectionStore(spark,
      java.nio.file.Files.createTempDirectory("graft-limspec").toString,
      CollectionSchema("LimSpec", "id", Seq(Property("v", PropType.Int))))
      .withMaxObjects(30L)
    st.init(docs)
    // merge and delete never add objects — no cap check fires at the cap
    st.merge(docs.limit(1).select(col("id"), lit(-1).as("v")))
    st.deleteWhere(Where.eqInt("id", 5L))
    intercept[UsageLimits.LimitExceeded](
      st.upsert(docs.limit(2).withColumn("id", col("id") + 100L)))
  }
}
