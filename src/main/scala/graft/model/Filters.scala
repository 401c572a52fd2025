package graft.model

/**
 * The `where` predicate algebra — mirrors weaviate's 14-operator clause tree
 * (reference: entities/filters/filters.go:25-40 for the operator enum,
 * filters.go:155-167 for Clause/GeoRange shapes).
 *
 * The reference executes these as roaring-bitmap set ops per shard
 * (adapters/repos/db/inverted/prop_value_pairs.go:60-130); here every clause
 * compiles to a Catalyst `Column` predicate so parquet pushdown / pruning is
 * free, and ref-path clauses compile to semi-joins (see FilterCompiler).
 */
sealed abstract class WhereOp(val name: String)
object WhereOp {
  case object And              extends WhereOp("And")
  case object Or               extends WhereOp("Or")
  case object Not              extends WhereOp("Not")
  case object Equal            extends WhereOp("Equal")
  case object NotEqual         extends WhereOp("NotEqual")
  case object GreaterThan      extends WhereOp("GreaterThan")
  case object GreaterThanEqual extends WhereOp("GreaterThanEqual")
  case object LessThan         extends WhereOp("LessThan")
  case object LessThanEqual    extends WhereOp("LessThanEqual")
  case object Like             extends WhereOp("Like")
  case object WithinGeoRange   extends WhereOp("WithinGeoRange")
  case object IsNull           extends WhereOp("IsNull")
  case object ContainsAny      extends WhereOp("ContainsAny")
  case object ContainsAll      extends WhereOp("ContainsAll")
  case object ContainsNone     extends WhereOp("ContainsNone")
}

/** Typed filter values (reference: filters.go Value + schema.DataType pairing). */
sealed trait FilterValue
object FilterValue {
  final case class IntV(v: Long)         extends FilterValue
  final case class NumberV(v: Double)    extends FilterValue
  final case class TextV(v: String)      extends FilterValue
  final case class BoolV(v: Boolean)     extends FilterValue
  /** RFC3339 instant; compared against timestamp columns. */
  final case class DateV(v: java.sql.Timestamp) extends FilterValue
  final case class ListV(vs: Seq[FilterValue])  extends FilterValue
  /** reference: filters.go:162-167 GeoRange{GeoCoordinates, Distance} */
  final case class GeoRangeV(lat: Double, lon: Double, distanceMeters: Double) extends FilterValue
}

/**
 * One node of the predicate tree.
 *
 * `path` semantics (reference: entities/filters/path.go):
 *  - `Seq("prop")`                         — plain property
 *  - `Seq("obj", "field")`                 — nested object descent (struct dot-path)
 *  - `Seq("refProp", "TargetClass", ...)`  — cross-reference descent: the tail
 *    is evaluated on the target collection and semi-joined back
 *    (reference: inverted/searcher.go:643, searcher_ref_filter.go)
 *  - `Seq("len(prop)")`                    — property length filter
 *    (reference: searcher.go:945-970)
 *  - `_id`, `_creationTimeUnix`, `_lastUpdateTimeUnix` — metadata pseudo-props
 *    (reference: searcher.go:789-816)
 */
final case class Where(
    op: WhereOp,
    path: Seq[String] = Nil,
    value: Option[FilterValue] = None,
    operands: Seq[Where] = Nil)

/** Convenience constructors so query-building code stays readable. */
object Where {
  import FilterValue._
  private def leaf(op: WhereOp, path: Seq[String], v: FilterValue) =
    Where(op, path, Some(v))

  def and(ws: Where*): Where = Where(WhereOp.And, operands = ws)
  def or(ws: Where*): Where  = Where(WhereOp.Or, operands = ws)
  def not(w: Where): Where   = Where(WhereOp.Not, operands = Seq(w))

  def eqText(path: String, v: String): Where   = leaf(WhereOp.Equal, split(path), TextV(v))
  def eqInt(path: String, v: Long): Where      = leaf(WhereOp.Equal, split(path), IntV(v))
  def eqBool(path: String, v: Boolean): Where  = leaf(WhereOp.Equal, split(path), BoolV(v))
  def neText(path: String, v: String): Where   = leaf(WhereOp.NotEqual, split(path), TextV(v))
  def neInt(path: String, v: Long): Where      = leaf(WhereOp.NotEqual, split(path), IntV(v))
  def gtNum(path: String, v: Double): Where    = leaf(WhereOp.GreaterThan, split(path), NumberV(v))
  def geNum(path: String, v: Double): Where    = leaf(WhereOp.GreaterThanEqual, split(path), NumberV(v))
  def ltNum(path: String, v: Double): Where    = leaf(WhereOp.LessThan, split(path), NumberV(v))
  def leNum(path: String, v: Double): Where    = leaf(WhereOp.LessThanEqual, split(path), NumberV(v))
  def gtInt(path: String, v: Long): Where      = leaf(WhereOp.GreaterThan, split(path), IntV(v))
  def geInt(path: String, v: Long): Where      = leaf(WhereOp.GreaterThanEqual, split(path), IntV(v))
  def ltInt(path: String, v: Long): Where      = leaf(WhereOp.LessThan, split(path), IntV(v))
  def leInt(path: String, v: Long): Where      = leaf(WhereOp.LessThanEqual, split(path), IntV(v))
  def gtDate(path: String, v: String): Where   = leaf(WhereOp.GreaterThan, split(path), DateV(utcTs(v)))
  def ltDate(path: String, v: String): Where   = leaf(WhereOp.LessThan, split(path), DateV(utcTs(v)))
  def geDate(path: String, v: String): Where   = leaf(WhereOp.GreaterThanEqual, split(path), DateV(utcTs(v)))

  /** Parse an RFC3339 instant ("2024-01-01T10:00:00Z", "…+02:00") or the
    * naive "yyyy-MM-dd[ HH:mm:ss]" form as a UTC instant (session TZ is
    * UTC, so filter literals line up with naive timestamps in
    * parquet/DuckDB). The zoned forms are the canonical weaviate date
    * literals — a naive-only parser rejected them. */
  def utcTs(v: String): java.sql.Timestamp = {
    val norm = if (v.contains(" ") || v.contains("T")) v.replace(' ', 'T') else v + "T00:00:00"
    val instant =
      try java.time.OffsetDateTime.parse(norm).toInstant
      catch { case _: java.time.format.DateTimeParseException =>
        java.time.LocalDateTime.parse(norm).toInstant(java.time.ZoneOffset.UTC)
      }
    java.sql.Timestamp.from(instant)
  }
  def like(path: String, pattern: String): Where = leaf(WhereOp.Like, split(path), TextV(pattern))
  def isNull(path: String, v: Boolean = true): Where = leaf(WhereOp.IsNull, split(path), BoolV(v))
  def containsAnyText(path: String, vs: Seq[String]): Where =
    leaf(WhereOp.ContainsAny, split(path), ListV(vs.map(TextV.apply)))
  def containsAllText(path: String, vs: Seq[String]): Where =
    leaf(WhereOp.ContainsAll, split(path), ListV(vs.map(TextV.apply)))
  def containsNoneText(path: String, vs: Seq[String]): Where =
    leaf(WhereOp.ContainsNone, split(path), ListV(vs.map(TextV.apply)))
  def containsAnyInt(path: String, vs: Seq[Long]): Where =
    leaf(WhereOp.ContainsAny, split(path), ListV(vs.map(IntV.apply)))
  def withinGeoRange(path: String, lat: Double, lon: Double, meters: Double): Where =
    leaf(WhereOp.WithinGeoRange, split(path), GeoRangeV(lat, lon, meters))

  private def split(path: String): Seq[String] =
    path.split('/').toSeq // "refProp/TargetClass/field" or "obj/field"
}
