package graft.engine

/**
 * Server-side usage limits (reference: usecases/usagelimits — manager.go
 * CheckObjects, errors.go LimitExceededError/ErrorCode, template.go
 * RenderTemplate). The reference enforces an instance-wide object cap at the
 * storage chokepoint (Shard.PutObject/Batch) and collection/tenant/shard
 * caps inline in the schema layer; all of them surface the same typed error
 * with the machine-stable code `USAGE_LIMIT_EXCEEDED` and an
 * operator-overridable message template.
 *
 * Engine wiring: the objects cap guards [[graft.sources.CollectionStore]]'s
 * write chokepoint (init/upsert — `current + n > cap` rejects, exactly the
 * reference's pre-write check), the collections cap guards
 * [[Graft.register]] for NEW names, and the tenants cap guards
 * `Graft.addTenants` across the whole registry. An unset cap means
 * unlimited (the reference's nil DynamicValue → -1 rule — note its
 * explicit guard against nil reading as "zero allowed").
 */
object UsageLimits {

  /** errors.go LimitName values — stable wire identifiers. */
  val LimitObjects = "objects"
  val LimitCollections = "collections"
  val LimitTenants = "tenants"
  val LimitShards = "shards"

  /** errors.go ErrorCode. */
  val ErrorCode = "USAGE_LIMIT_EXCEEDED"

  /** template.go DefaultErrorMessageTemplate. */
  val DefaultTemplate = "{limit} count limit of {value} reached for this instance."

  /** template.go RenderTemplate: {limit} and {value} substitute, every
   * other token passes through unchanged (operators embed upgrade URLs
   * etc. without escaping); empty template falls back to the default. */
  def render(template: String, limit: String, value: Long): String = {
    val t = if (template.isEmpty) DefaultTemplate else template
    t.replace("{limit}", limit).replace("{value}", value.toString)
  }

  /** The typed error (errors.go LimitExceededError): message = the rendered
   * template; the code and structured fields ride along for a wire layer. */
  final case class LimitExceeded(limit: String, value: Long, rendered: String)
      extends RuntimeException(rendered)

  def exceeded(template: String, limit: String, cap: Long): LimitExceeded =
    LimitExceeded(limit, cap, render(template, limit, cap))

  /** manager.go CheckObjects shape: reject when `current + n > cap`; a None
   * cap is unlimited. Shared by every wired chokepoint. */
  def check(cap: Option[Long], current: Long, n: Long,
            limit: String, template: String = ""): Unit =
    cap.foreach { c => if (current + n > c) throw exceeded(template, limit, c) }
}
