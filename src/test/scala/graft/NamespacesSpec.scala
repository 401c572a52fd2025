package graft

import org.apache.spark.sql.functions._

import graft.engine.{Graft, Namespaces}
import graft.engine.Namespaces._
import graft.model.{CollectionSchema, GetParams, Pagination, Property, PropType}

/**
 * Namespace control-plane state machine + the data-plane requireActive gate
 * (reference: usecases/namespaces/controller_test.go, require_active_test.go,
 * public_message_test.go, enum_parity_test.go).
 */
class NamespacesSpec extends SparkSpecBase {
  import spark.implicits._

  test("name validation: length bounds, charset, edges, reserved names") {
    val c = new Namespaces
    assert(c.create("ab", "n1", 1).isLeft)                    // < 3
    assert(c.create("a" * 37, "n1", 1).isLeft)                // > 36
    assert(c.create("Customer1", "n1", 1).isLeft)             // uppercase
    assert(c.create("-edge", "n1", 1).isLeft)                 // leading hyphen
    assert(c.create("edge-", "n1", 1).isLeft)                 // trailing hyphen
    assert(c.create("cust:omer", "n1", 1).isLeft)             // colon
    Namespaces.reservedNames.foreach(r =>
      assert(c.create(r, "n1", 1) == Left(BadRequest), s"reserved $r"))
    // Java's $ matches before a trailing line terminator — a full-string
    // match must refuse these (and keep reserved names unreachable via \n)
    assert(c.create("default\n", "n1", 1) == Left(BadRequest))
    assert(c.create("abc\n", "n1", 1) == Left(BadRequest))
    assert(c.create("customer-1", "n1", 1).isRight)
    assert(c.create("abc", "n1", 2).isRight)
    assert(c.create("a" * 36, "n1", 3).isRight)
  }

  test("create: stores ACTIVE, rejects dup vs deleting distinctly, index/home rules") {
    val c = new Namespaces
    assert(c.create("team-a", "n1", 0) == Left(BadRequest))   // zero index
    assert(c.create("team-a", "", 1) == Left(BadRequest))     // empty home node
    assert(c.create("team-a", "n1", 7).isRight)
    assert(c.get("team-a").contains(Namespace("team-a", "n1", State.Active, 7)))
    assert(c.create("team-a", "n2", 8) == Left(AlreadyExists))
    assert(c.changeState("team-a", State.Deleting, 9).isRight)
    assert(c.create("team-a", "n2", 10) == Left(NamespaceDeleting))
  }

  test("changeState: transition table, idempotent same-state, terminal deleting") {
    val c = new Namespaces
    c.create("team-a", "n1", 1)
    // active → resuming is illegal
    assert(c.changeState("team-a", State.Resuming, 2) == Left(InvalidStateTransition))
    // same-state flip is a no-op that leaves the recorded index alone
    assert(c.changeState("team-a", State.Active, 2).isRight)
    assert(c.get("team-a").get.stateChangeIndex == 1)
    assert(c.changeState("team-a", State.Suspended, 3).isRight)
    assert(c.changeState("team-a", State.Resuming, 4).isRight)
    assert(c.changeState("team-a", State.Active, 5).isRight)
    assert(c.changeState("team-a", State.Deleting, 6).isRight)
    // deleting is terminal
    assert(c.changeState("team-a", State.Active, 7) == Left(InvalidStateTransition))
    assert(c.changeState("missing", State.Active, 8) == Left(NotFound))
    assert(c.changeState("team-a", State.Active, 0) == Left(BadRequest))
  }

  test("changeState precondition: CAS on the stored index; stale retry cannot revert") {
    val c = new Namespaces
    c.create("team-a", "n1", 1)
    assert(c.changeState("team-a", State.Suspended, 5, expectedIndex = 1).isRight)
    // a re-proposed command carrying the old expected index is refused...
    assert(c.changeState("team-a", State.Active, 6, expectedIndex = 1) ==
      Left(StateChangedConcurrently))
    // ...but re-applying the SAME committed flip stays nil (same-state check
    // runs before the CAS)
    assert(c.changeState("team-a", State.Suspended, 5, expectedIndex = 1).isRight)
    assert(c.get("team-a").get.stateChangeIndex == 5)
    assert(c.changeState("team-a", State.Active, 7, expectedIndex = 5).isRight)
  }

  test("removeEntity only from deleting; recreate after removal works") {
    val c = new Namespaces
    c.create("team-a", "n1", 1)
    assert(c.removeEntity("team-a") == Left(InvalidState))
    c.changeState("team-a", State.Deleting, 2)
    assert(c.listDeleting() == Seq("team-a"))
    assert(c.removeEntity("team-a").isRight)
    assert(c.removeEntity("team-a") == Left(NotFound))
    assert(c.create("team-a", "n2", 3).isRight)
    assert(c.get("team-a").get.state == State.Active)
  }

  test("update overwrites home node only; deleting refuses") {
    val c = new Namespaces
    c.create("team-a", "n1", 1)
    assert(c.update("team-a", "") == Left(BadRequest))
    assert(c.update("missing", "n2") == Left(NotFound))
    assert(c.update("team-a", "n2").isRight)
    assert(c.get("team-a").contains(Namespace("team-a", "n2", State.Active, 1)))
    c.changeState("team-a", State.Deleting, 2)
    assert(c.update("team-a", "n3") == Left(NamespaceDeleting))
  }

  test("snapshot/restore round-trip; empty state normalizes; unknown state rejected") {
    val c = new Namespaces
    c.create("team-a", "n1", 1); c.create("team-b", "n2", 2)
    c.changeState("team-b", State.Suspended, 3)
    val snap = c.snapshot()
    val c2 = new Namespaces
    assert(c2.restore(snap).isRight)
    assert(c2.snapshot() == snap)
    assert(c2.restore(Seq(("team-c", "n3", "", 4))).isRight)   // "" → ACTIVE
    assert(c2.get("team-c").get.state == State.Active)
    assert(c2.restore(Seq(("team-d", "n4", "FROZEN", 5))) == Left(BadRequest))
    assert(c2.restore(Seq(("team-e", "", "ACTIVE", 6))) == Left(BadRequest))
    // duplicate names in a snapshot stream: the LATER entry wins
    assert(c2.restore(Seq(
      ("team-a", "n1", "ACTIVE", 1L),
      ("team-a", "n2", "SUSPENDED", 2L))).isRight)
    assert(c2.get("team-a").contains(Namespace("team-a", "n2", State.Suspended, 2)))
    assert(c2.restore(Nil).isRight)                            // fresh bootstrap
    assert(c2.count == 0)
  }

  test("requireActive sentinel per state; public messages match the reference table") {
    val c = new Namespaces
    assert(c.requireActive("").isRight)                        // no namespace
    assert(c.requireActive("ghost") == Left(NamespaceGone))
    c.create("team-a", "n1", 1)
    assert(c.requireActive("team-a").isRight)
    c.changeState("team-a", State.Suspended, 2)
    assert(c.requireActive("team-a") == Left(NamespaceSuspended))
    c.changeState("team-a", State.Resuming, 3)
    assert(c.requireActive("team-a") == Left(NamespaceResuming))
    c.changeState("team-a", State.Deleting, 4)
    assert(c.requireActive("team-a") == Left(NamespaceDeleting))

    assert(publicMessage(NamespaceSuspended).contains("instance suspended"))
    assert(publicMessage(NamespaceResuming).contains("instance resuming, retry shortly"))
    Seq(NamespaceGone, NamespaceDeleting, InvalidState, InvalidStateTransition, NotFound)
      .foreach(e => assert(publicMessage(e).contains("instance unavailable")))
    Seq(BadRequest, AlreadyExists, StateChangedConcurrently)
      .foreach(e => assert(publicMessage(e).isEmpty))
  }

  test("qualified-name helpers and qualified collection lookup") {
    // resolver.go pure helpers
    assert(qualifiedName("", "Doc") == "Doc")
    assert(qualifiedName("team-a", "Doc") == "team-a:Doc")
    assert(namespaceFromQualified("team-a:Doc") == "team-a")
    assert(namespaceFromQualified("Doc") == "")
    assert(stripQualification("team-a:Doc") == "Doc")
    assert(stripQualification("Doc") == "Doc")

    val df = Seq((1L, "a")).toDF("id", "txt")
    val g = new Graft(spark).register(
      CollectionSchema("QDoc", "id", Seq(Property("txt", PropType.Text))), df)
    g.namespaces.create("team-a", "n1", 1)
    g.namespaces.create("team-b", "n1", 2)
    g.assignNamespace("QDoc", "team-a")
    // qualified lookup with the RIGHT prefix serves; a foreign prefix gets
    // the reference's invalid-class-name rejection (refs/lookups never
    // cross namespaces); unqualified keeps working
    assert(g.collection("team-a:QDoc").name == "QDoc")
    assert(g.collection("QDoc").name == "QDoc")
    val e = intercept[IllegalArgumentException](g.collection("team-b:QDoc"))
    assert(e.getMessage == "'team-b:QDoc' is not a valid class name")
    // hasCollection answers, never throws, on a foreign prefix
    assert(g.hasCollection("team-a:QDoc"))
    assert(!g.hasCollection("team-b:QDoc"))
  }

  test("qualified names key the SAME tenant registry as the short name") {
    val df = Seq((1L, "a", "t0"), (2L, "b", "t1")).toDF("id", "txt", "tenant")
    val g = new Graft(spark).register(
      CollectionSchema("QTen", "id", Seq(
        Property("txt", PropType.Text),
        Property("tenant", PropType.Text)), tenantColumn = Some("tenant")), df)
    g.namespaces.create("team-a", "n1", 1)
    g.assignNamespace("QTen", "team-a")
    g.addTenants("team-a:QTen", Seq(graft.model.Tenant("t0"), graft.model.Tenant("t1")))
    // visible under BOTH addressings — a raw-alias keyed registry would
    // return empty for one of them
    assert(g.tenants("QTen").map(_.name) == Seq("t0", "t1"))
    assert(g.tenants("team-a:QTen").map(_.name) == Seq("t0", "t1"))
    g.deleteTenants("team-a:QTen", Seq("t1"))
    assert(g.tenants("QTen").map(_.name) == Seq("t0"))
    // deleting tenants of an unknown class errors instead of inserting a
    // bogus registry entry
    assert(intercept[IllegalArgumentException](
      g.deleteTenants("Nope", Seq("t0"))).getMessage.contains("unknown collection"))
  }

  test("a suspended namespace gates its collections at the engine chokepoint") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "txt")
    val g = new Graft(spark).register(
      CollectionSchema("NsDoc", "id", Seq(Property("txt", PropType.Text))), df)
    g.namespaces.create("team-a", "n1", 1)
    g.assignNamespace("NsDoc", "team-a")
    def page() = g.get(GetParams("NsDoc",
      pagination = Some(Pagination(limit = 10)), properties = Seq("id"))).count()
    assert(page() == 2)
    g.namespaces.changeState("team-a", State.Suspended, 2)
    val e = intercept[IllegalStateException](page())
    assert(e.getMessage == "instance suspended")
    g.namespaces.changeState("team-a", State.Resuming, 3)
    assert(intercept[IllegalStateException](page()).getMessage ==
      "instance resuming, retry shortly")
    g.namespaces.changeState("team-a", State.Active, 4)
    assert(page() == 2)
    // assigning to a non-active namespace is refused with the public text
    g.namespaces.create("team-b", "n1", 5)
    g.namespaces.changeState("team-b", State.Suspended, 6)
    assert(intercept[IllegalStateException](
      g.assignNamespace("NsDoc", "team-b")).getMessage == "instance suspended")
  }
}
