package graft.engine

/**
 * Operator allow-list restrictions on class configuration (reference:
 * usecases/restrictions — errors.go ViolationError/ErrorCode, template.go
 * RenderTemplate). The reference lets operators restrict which
 * `vector_index_type` and `compression` values a class config may use;
 * violations surface the machine-stable code `CONFIG_NOT_ALLOWED` with an
 * operator-overridable message whose {allowed} list is SORTED so the wire
 * output is deterministic regardless of configured order.
 *
 * Engine wiring: [[Graft.withRestrictions]] installs the allow-lists;
 * `registerIndex`/`registerDynamicIndex` check `vector_index_type`
 * ("ivf"/"dynamic") at registration — the engine's analogue of
 * config-parse-time validation. The compression check is the same pure
 * function over the quantizer family names ("pq"/"bq"/"sq"/"rq").
 */
object Restrictions {

  /** errors.go RestrictionName values. */
  val VectorIndexType = "vector_index_type"
  val Compression = "compression"

  /** errors.go ErrorCode. */
  val ErrorCode = "CONFIG_NOT_ALLOWED"

  /** template.go DefaultErrorMessageTemplate. */
  val DefaultTemplate = "{value} is not allowed for {restriction}. Allowed values: {allowed}."

  /** template.go RenderTemplate: {restriction}/{value}/{allowed} substitute,
   * allowed joined ", " after sorting; empty template = default. */
  def render(template: String, restriction: String, value: String,
             allowed: Seq[String]): String = {
    val t = if (template.isEmpty) DefaultTemplate else template
    t.replace("{restriction}", restriction)
      .replace("{value}", value)
      .replace("{allowed}", allowed.sorted.mkString(", "))
  }

  /** errors.go ViolationError: message = the rendered template. */
  final case class Violation(restriction: String, value: String,
                             allowed: Seq[String], rendered: String)
      extends RuntimeException(rendered)

  /** Reject `value` unless it is in the allow-list; a None list means the
   * restriction is not configured (everything allowed). */
  def check(allowed: Option[Seq[String]], restriction: String, value: String,
            template: String = ""): Unit =
    allowed.foreach { al =>
      if (!al.contains(value))
        throw Violation(restriction, value, al, render(template, restriction, value, al))
    }
}
