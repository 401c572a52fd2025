package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Matcher + error-text contracts (reference: usecases/auth/authorization —
 * casbin segment matching, errors/errors.go rendering). The live engine
 * wiring (get/aggregate/register under a policy) is gated by q_rbac. */
class RbacSpec extends AnyFunSuite {

  test("segment matcher: wildcards match whole segments, never prefixes") {
    assert(Rbac.matches("*", Rbac.objects("A", "t", "x")))
    assert(Rbac.matches(Rbac.objects("A"), Rbac.objects("A", "t1", "42")))
    assert(Rbac.matches(Rbac.objects("A", "t1"), Rbac.objects("A", "t1", "42")))
    assert(!Rbac.matches(Rbac.objects("A", "t1"), Rbac.objects("A", "t2", "42")))
    // no prefix leak: a grant on A must not cover AB (segment equality)
    assert(!Rbac.matches(Rbac.objects("A"), Rbac.objects("AB")))
    // depth mismatch never matches (data path vs schema path)
    assert(!Rbac.matches(Rbac.objects("A"), Rbac.collectionsMetadata("A")))
    // '#' (collection-only shard marker) is compatible with any shard pattern
    assert(Rbac.matches(Rbac.collectionsMetadata(), Rbac.collectionsMetadata("A")))
    assert(Rbac.matches("schema/collections/A/shards/*", Rbac.collectionsMetadata("A")))
    // wildcards live on the PATTERN side only: a tenant (or collection)
    // literally named '#'/'*' in the RESOURCE is caller data and must not
    // match a scoped grant (tenant-scope bypass otherwise)
    assert(!Rbac.matches(Rbac.objects("A", "tenantA"), Rbac.objects("A", "#")))
    assert(!Rbac.matches(Rbac.objects("A", "tenantA"), "data/collections/A/shards/*/objects/*"))
  }

  test("built-in roles: viewer reads everything, mutates nothing") {
    val pol = Rbac.Policy(Rbac.BuiltInRoles, Map("v" -> Seq("viewer")))
    val p = Some(Rbac.Principal("v"))
    Rbac.authorize(pol, p, Rbac.ReadData, Seq(Rbac.objects("Any", "t", "id")))
    Rbac.authorize(pol, p, Rbac.ReadCollections, Seq(Rbac.collectionsMetadata("Any")))
    val e = intercept[SecurityException](
      Rbac.authorize(pol, p, Rbac.CreateData, Seq(Rbac.objects("Any"))))
    assert(e.getMessage.contains("insufficient permissions to create_data"))
  }

  test("error texts: unauthenticated, single-group and backup-domain rendering") {
    val pol = Rbac.Policy(Rbac.BuiltInRoles, Map.empty)
    val e0 = intercept[SecurityException](
      Rbac.authorize(pol, None, Rbac.ReadData, Seq(Rbac.objects("A"))))
    assert(e0.getMessage == "rbac: user is not authenticated")
    assert(Rbac.forbiddenText(Rbac.Principal("u", Seq("g1")), Rbac.ManageBackups,
      Rbac.backups("A")) ==
      "rbac: authorization, forbidden action: user 'u' (of group 'g1') " +
        "has insufficient permissions to manage_backups [[Domain: backups,Collection: A]]")
    // zero resources is a caller bug, rejected loudly (authorizer.go)
    intercept[IllegalArgumentException](
      Rbac.authorize(pol, Some(Rbac.Principal("u")), Rbac.ReadData, Nil))
  }
}
