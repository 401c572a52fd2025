package graft.engine

/**
 * RBAC-lite: role-based action allow-lists over collection/tenant-scoped
 * resource paths, enforced at the engine's query/registration entry points
 * (reference: usecases/auth/authorization — types.go `{verb}_{domain}`
 * actions and the Objects/CollectionsMetadata/Backups resource-path
 * formatters; rbac/authorizer.go authorize loop — every requested resource
 * must be allowed or the whole call rejects; errors/errors.go
 * Forbidden/Unauthenticated texts; built-in roles types.go viewer/admin/
 * root/read-only).
 *
 * Deliberately data-plane-scoped: the reference's user/group/OIDC
 * management, role CRUD APIs and casbin persistence are control-plane
 * machinery a library embeds as a plain immutable [[Policy]] value. The
 * matcher is segment-wise (the shape casbin's path matcher enforces on
 * these fixed-depth resource strings), so a permission on collection X can
 * never leak onto collection XY.
 */
object Rbac {

  // actions, types.go:135-162 ({verb}_{domain})
  val CreateData = "create_data"
  val ReadData = "read_data"
  val UpdateData = "update_data"
  val DeleteData = "delete_data"
  val CreateCollections = "create_collections"
  val ReadCollections = "read_collections"
  val UpdateCollections = "update_collections"
  val DeleteCollections = "delete_collections"
  val ManageBackups = "manage_backups"
  val CreateTenants = "create_tenants"
  val ReadTenants = "read_tenants"
  val UpdateTenants = "update_tenants"
  val DeleteTenants = "delete_tenants"

  final case class Principal(username: String, groups: Seq[String] = Nil)

  /** One grant: an action plus a resource pattern ('*' matches one whole
   * path segment; a sole "*" matches every resource). */
  final case class Permission(action: String, resource: String)
  final case class Role(name: String, permissions: Seq[Permission])

  /** Roles + user→role assignments. Immutable — "updating" RBAC is building
   * a new Policy, the analytics-library analogue of the reference's raft-
   * replicated casbin model. */
  final case class Policy(roles: Seq[Role], assignments: Map[String, Seq[String]]) {
    private[Rbac] def permissionsOf(user: String): Seq[Permission] =
      assignments.getOrElse(user, Nil)
        .flatMap(rn => roles.find(_.name == rn))
        .flatMap(_.permissions)
  }

  // resource formatters (types.go Objects / CollectionsMetadata / Backups —
  // empty params widen to '*'; '#' marks a collection-only shard check)
  def objects(collection: String = "", tenant: String = "", id: String = ""): String = {
    def or(s: String) = if (s.isEmpty) "*" else s
    s"data/collections/${or(collection)}/shards/${or(tenant)}/objects/${or(id)}"
  }
  def collectionsMetadata(collection: String = ""): String =
    s"schema/collections/${if (collection.isEmpty) "*" else collection}/shards/#"
  def backups(collection: String = ""): String =
    s"backups/collections/${if (collection.isEmpty) "*" else collection}"

  // built-in roles (types.go BuiltInRoles; BuiltInPermissionsFor — admin and
  // root carry every action on every resource, viewer and read-only the
  // read_* subset)
  private val allActions = Seq(
    CreateData, ReadData, UpdateData, DeleteData,
    CreateCollections, ReadCollections, UpdateCollections, DeleteCollections,
    ManageBackups, CreateTenants, ReadTenants, UpdateTenants, DeleteTenants)
  val Admin: Role = Role("admin", allActions.map(Permission(_, "*")))
  val Viewer: Role =
    Role("viewer", allActions.filter(_.startsWith("read_")).map(Permission(_, "*")))
  val Root: Role = Admin.copy(name = "root")
  val ReadOnly: Role = Viewer.copy(name = "read-only")
  val BuiltInRoles: Seq[Role] = Seq(Viewer, Admin, Root, ReadOnly)

  /** Segment-wise wildcard match over the fixed-depth resource paths.
   * Wildcards live on the PATTERN side only ('*' any segment; '#' the
   * collection-only shard marker, also matched by a '*'/'#' pattern
   * segment) — a '#' or '*' arriving on the RESOURCE side is caller data
   * (e.g. a tenant literally named "#") and must match nothing but itself,
   * else a crafted tenant name bypasses tenant-scoped grants. */
  private[engine] def matches(pattern: String, resource: String): Boolean =
    pattern == "*" || {
      val ps = pattern.split("/", -1)
      val rs = resource.split("/", -1)
      ps.length == rs.length && ps.zip(rs).forall {
        case (p, r) => p == "*" || p == r
      }
    }

  /**
   * Authorize `verb` on every resource or throw (rbac/authorizer.go
   * authorize: nil principal → Unauthenticated; zero resources rejected;
   * first disallowed resource raises Forbidden with the pretty-rendered
   * permission — error texts verbatim, including authorizer.go's "rbac: "
   * wrap and Go's slice rendering of the single pretty resource).
   */
  def authorize(policy: Policy, principal: Option[Principal], verb: String,
                resources: Seq[String]): Unit = {
    val pr = principal.getOrElse(
      throw new SecurityException("rbac: user is not authenticated"))
    require(resources.nonEmpty, "at least 1 resource is required")
    val perms = policy.permissionsOf(pr.username)
    resources.distinct.foreach { res =>
      if (!perms.exists(p => p.action == verb && matches(p.resource, res)))
        throw new SecurityException(forbiddenText(pr, verb, res))
    }
  }

  /** errors.go Forbidden.Error() under authorizer.go's "rbac: %w" wrap;
   * the resource renders via manager.go prettyPermissionsResources. */
  private[engine] def forbiddenText(pr: Principal, verb: String, resource: String): String = {
    val groups = pr.groups match {
      case Nil => ""
      case Seq(one) => s" (of group '$one')"
      case many => s" (of groups ${many.map(g => s"'$g'").mkString(", ")})"
    }
    s"rbac: authorization, forbidden action: user '${pr.username}'$groups " +
      s"has insufficient permissions to $verb [${pretty(resource)}]"
  }

  // manager.go prettyPermissionsResources: domain-shaped field rendering —
  // data keeps a space before each field and strips the trailing comma;
  // backups renders Collection with NO leading space (faithful quirk)
  private def pretty(resource: String): String = resource.split("/", -1) match {
    case Array("data", "collections", c, "shards", t, "objects", o) =>
      s"[Domain: data, Collection: $c, Tenant: $t, Object: $o]"
    // a schema/... path converts to the Collections permission shape, whose
    // domain label is "collections" (types.go CollectionsDomain), not "schema"
    case Array("schema", "collections", c, "shards", _) =>
      s"[Domain: collections, Collection: $c]"
    case Array("backups", "collections", c) =>
      s"[Domain: backups,Collection: $c]"
    case _ => s"[$resource]"
  }
}
