package graft.model

/**
 * Tenant activity status (reference: entities/models/tenant.go:34-104).
 * Modern names with the deprecated aliases the reference still accepts:
 * HOT→ACTIVE, COLD→INACTIVE, FROZEN→OFFLOADED. The transitional server-set
 * states (OFFLOADING/ONLOADING) don't exist here — offload is a synchronous
 * batch move, so a tenant is never observed mid-transition.
 */
sealed abstract class TenantStatus(val name: String)
object TenantStatus {
  case object Active    extends TenantStatus("ACTIVE")    // queryable, local hot storage
  case object Inactive  extends TenantStatus("INACTIVE")  // not queryable, data local
  case object Offloaded extends TenantStatus("OFFLOADED") // not queryable, data remote

  // Locale.ROOT: the default-locale toUpperCase breaks under tr-TR
  // ("inactive" → "İNACTİVE", dotted capital I)
  def parse(s: String): TenantStatus = s.toUpperCase(java.util.Locale.ROOT) match {
    case "ACTIVE" | "HOT"       => Active
    case "INACTIVE" | "COLD"    => Inactive
    case "OFFLOADED" | "FROZEN" => Offloaded
    case other => throw new IllegalArgumentException(
      s"invalid tenant activity status '$other' (tenant.go:34 — " +
      "ACTIVE/INACTIVE/OFFLOADED, deprecated HOT/COLD/FROZEN)")
  }
}

/** A tenant row (reference: entities/models/tenant.go Tenant). */
final case class Tenant(name: String, activityStatus: TenantStatus = TenantStatus.Active)
