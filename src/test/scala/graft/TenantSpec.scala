package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{Collection, Graft}
import graft.model._
import graft.sources.CollectionStore

/**
 * Tenant lifecycle (reference: usecases/schema/tenant.go,
 * entities/models/tenant.go:34, errors_multitenancy.go:19-20) and the
 * store-level offload analogue (modules/offload-s3: one tenant = one shard
 * directory moved wholesale).
 */
class TenantSpec extends SparkSpecBase {
  import spark.implicits._

  private def engine: Graft = {
    val df = Seq((1L, "a", "t0"), (2L, "b", "t0"), (3L, "c", "t1"))
      .toDF("id", "name", "tenant")
    new Graft(spark).register(Collection(CollectionSchema("MT", "id", Seq(
      Property("name", PropType.Text, Tokenization.Field),
      Property("tenant", PropType.Text, Tokenization.Field)),
      tenantColumn = Some("tenant")), df))
  }

  test("status parse: modern names and deprecated HOT/COLD/FROZEN aliases") {
    assert(TenantStatus.parse("hot") == TenantStatus.Active)
    assert(TenantStatus.parse("COLD") == TenantStatus.Inactive)
    assert(TenantStatus.parse("Frozen") == TenantStatus.Offloaded)
    assert(TenantStatus.parse("ACTIVE") == TenantStatus.Active)
    intercept[IllegalArgumentException](TenantStatus.parse("LUKEWARM"))
  }

  test("create defaults ACTIVE; OFFLOADED on create is rejected; re-create idempotent") {
    val g = engine.addTenants("MT", Seq(Tenant("t0")))
    assert(g.tenants("MT") == Seq(Tenant("t0", TenantStatus.Active)))
    intercept[IllegalArgumentException](
      g.addTenants("MT", Seq(Tenant("t2", TenantStatus.Offloaded))))
    // re-asserting an existing tenant is idempotent (raft AddTenants skips
    // existing — create_delete_update_tenants_test.go), and it must not
    // clobber a non-default status
    g.updateTenant("MT", "t0", TenantStatus.Inactive)
    g.addTenants("MT", Seq(Tenant("t0")))
    assert(g.tenants("MT") == Seq(Tenant("t0", TenantStatus.Inactive)))
    // within-request duplicates reject atomically (validateTenants)
    val e = intercept[IllegalArgumentException](
      g.addTenants("MT", Seq(Tenant("t9"), Tenant("t9"))))
    assert(e.getMessage == "tenant name t9 existed multiple times")
    assert(!g.tenants("MT").exists(_.name == "t9"))
  }

  test("tenant names validate against the reference shard-name contract") {
    val g = engine
    val bad = intercept[IllegalArgumentException](
      g.addTenants("MT", Seq(Tenant("has space"))))
    assert(bad.getMessage.contains("'has space' is not a valid tenant name"))
    assert(intercept[IllegalArgumentException](
      g.addTenants("MT", Seq(Tenant("")))).getMessage.contains("empty tenant name"))
    intercept[IllegalArgumentException](
      g.addTenants("MT", Seq(Tenant("x" * 65))))
    g.addTenants("MT", Seq(Tenant("Ok-Name_42"))) // full legal charset
  }

  test("non-multi-tenant collection rejects tenant creation") {
    val g = new Graft(spark).register(Collection(
      CollectionSchema("Plain", "id", Seq(Property("name", PropType.Text))),
      Seq((1L, "x")).toDF("id", "name")))
    intercept[IllegalArgumentException](g.addTenants("Plain", Seq(Tenant("t"))))
  }

  test("get gates on registry: unknown → not found, INACTIVE → not active") {
    val g = engine.addTenants("MT", Seq(Tenant("t0"), Tenant("t1", TenantStatus.Inactive)))
    // ACTIVE tenant serves
    val rows = g.get(GetParams("MT", tenant = Some("t0"),
      pagination = Some(Pagination(limit = 10)), properties = Seq("id"))).collect()
    assert(rows.length == 2)
    val notActive = intercept[IllegalArgumentException](
      g.get(GetParams("MT", tenant = Some("t1"), pagination = Some(Pagination(limit = 1)))))
    assert(notActive.getMessage.contains("tenant not active"))
    val notFound = intercept[IllegalArgumentException](
      g.get(GetParams("MT", tenant = Some("nope"), pagination = Some(Pagination(limit = 1)))))
    assert(notFound.getMessage.contains("tenant not found"))
    // aggregate takes the same gate
    val aggGate = intercept[IllegalArgumentException](
      g.aggregate(AggregateParams("MT", includeMetaCount = true, tenant = Some("t1"))))
    assert(aggGate.getMessage.contains("tenant not active"))
  }

  test("autoTenantCreation creates on write; autoTenantActivation flips INACTIVE on read") {
    val g = engine.addTenants("MT", Seq(Tenant("t0", TenantStatus.Inactive)))
    // creation OFF: unknown write tenant errors
    val e = intercept[IllegalArgumentException](g.ensureTenants("MT", Seq("tNew")))
    assert(e.getMessage.contains("tenant not found: tNew"))
    // activation OFF: INACTIVE read errors
    intercept[IllegalArgumentException](
      g.get(GetParams("MT", tenant = Some("t0"), pagination = Some(Pagination(limit = 1)))))
    g.withAutoTenant("MT", creation = true, activation = true)
    // write to an unknown tenant now creates it ACTIVE
    g.ensureTenants("MT", Seq("tNew"))
    assert(g.tenants("MT").exists(t => t.name == "tNew" && t.activityStatus == TenantStatus.Active))
    // read against the INACTIVE tenant auto-activates and serves
    val rows = g.get(GetParams("MT", tenant = Some("t0"),
      pagination = Some(Pagination(limit = 10)), properties = Seq("id"))).collect()
    assert(rows.length == 2)
    assert(g.tenants("MT").exists(t => t.name == "t0" && t.activityStatus == TenantStatus.Active))
    // OFFLOADED still requires an explicit onload
    g.updateTenant("MT", "t0", TenantStatus.Offloaded)
    val off = intercept[IllegalArgumentException](
      g.get(GetParams("MT", tenant = Some("t0"), pagination = Some(Pagination(limit = 1)))))
    assert(off.getMessage.contains("tenant not active"))
    // the config flag itself is gated on multi-tenancy, reference error shape
    val nonMt = new Graft(spark).register(CollectionSchema("P1", "id",
      Seq(Property("v", PropType.Int))), Seq((1L, 2L)).toDF("id", "v"))
    val cfgErr = intercept[IllegalArgumentException](nonMt.withAutoTenant("P1", creation = true))
    assert(cfgErr.getMessage.contains("can't enable autoTenantCreation on a non-multi-tenant class"))
  }

  test("update cycles status; reactivated tenant serves again; delete unregisters") {
    val g = engine.addTenants("MT", Seq(Tenant("t0")))
    g.updateTenant("MT", "t0", TenantStatus.Inactive)
    intercept[IllegalArgumentException](
      g.get(GetParams("MT", tenant = Some("t0"), pagination = Some(Pagination(limit = 1)))))
    g.updateTenant("MT", "t0", TenantStatus.Active)
    assert(g.get(GetParams("MT", tenant = Some("t0"),
      pagination = Some(Pagination(limit = 10)))).count() == 2)
    intercept[IllegalArgumentException](g.updateTenant("MT", "ghost", TenantStatus.Active))
    // empty registry after delete → legacy pass-through behavior
    g.deleteTenants("MT", Seq("t0"))
    assert(g.tenants("MT").isEmpty)
    assert(g.get(GetParams("MT", tenant = Some("t1"),
      pagination = Some(Pagination(limit = 10)))).count() == 1)
  }

  test("unregistered collections keep plain tenant-filter behavior") {
    val rows = engine.get(GetParams("MT", tenant = Some("t1"),
      pagination = Some(Pagination(limit = 10)), properties = Seq("id"))).collect()
    assert(rows.length == 1)
  }

  test("store offload moves the tenant directory out; onload restores it") {
    val dir = Files.createTempDirectory("graft-tenant-store").toString
    val off = Files.createTempDirectory("graft-tenant-offload").toString
    val schema = CollectionSchema("MTS", "id", Seq(
      Property("name", PropType.Text, Tokenization.Field),
      Property("tenant", PropType.Text, Tokenization.Field)),
      tenantColumn = Some("tenant"))
    val st = new CollectionStore(spark, dir, schema)
    st.init(Seq((1L, "a", "t0"), (2L, "b", "t1"), (3L, "c", "t1"))
      .toDF("id", "name", "tenant"))

    st.offloadTenant("t1", off)
    // partition pruning sees no tenant=t1 directory → rows gone, t0 untouched
    val after = st.read().select("id").as[Long].collect().toSet
    assert(after == Set(1L))
    assert(new java.io.File(off).listFiles().exists(_.getName.contains("tenant=t1")))

    st.onloadTenant("t1", off)
    val restored = st.read().select("id").as[Long].collect().toSet
    assert(restored == Set(1L, 2L, 3L))
    // offloading a tenant with no directory fails loudly
    intercept[IllegalArgumentException](st.offloadTenant("ghost", off))
  }
}
