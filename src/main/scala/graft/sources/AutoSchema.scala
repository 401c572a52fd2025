package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/**
 * Auto-schema inference: derive a CollectionSchema from an incoming
 * DataFrame's Spark schema (reference: usecases/objects/auto_schema.go:82-191
 * — unseen classes/properties are inferred from values on write). Spark
 * already infers the *physical* types on read (`mergeSchema` handles
 * evolution); this maps them onto the engine's property model, including
 * nested objects and arrays.
 */
object AutoSchema {

  def propType(dt: DataType): PropType = dt match {
    case StringType                       => PropType.Text
    case LongType | IntegerType | ShortType | ByteType => PropType.Int
    case DoubleType | FloatType | _: DecimalType => PropType.Number
    case BooleanType                      => PropType.Bool
    case TimestampType | TimestampNTZType | DateType => PropType.Date
    case BinaryType                       => PropType.Blob
    case st: StructType
      if st.fieldNames.toSet == Set("lat", "lon") => PropType.Geo
    case _: StructType                    => PropType.Obj
    case ArrayType(FloatType, _)          => PropType.Arr(PropType.Number) // vector-shaped
    case ArrayType(elem, _)               => PropType.Arr(propType(elem))
    case other => throw new IllegalArgumentException(s"cannot infer property type for $other")
  }

  /** Infer a collection schema; columns named in `vectors` become named
   * vectors rather than properties (weaviate keeps vectors out of the
   * property namespace). */
  def infer(name: String, df: DataFrame, idColumn: String,
            vectors: Map[String, String] = Map.empty): CollectionSchema = {
    val vectorCols = vectors.values.toSet
    val props = df.schema.fields
      .filterNot(f => f.name == idColumn || vectorCols.contains(f.name))
      .map(f => Property(f.name, propType(f.dataType), Tokenization.Word))
    CollectionSchema(name, idColumn, props.toSeq, vectors,
      defaultVector = vectors.keys.headOption)
  }

  /** The accepting set of Go `time.Parse(time.RFC3339, ·)` as a regex
   * (reference auto_schema.go:238-244 — couldBeRFC3339 is just a shape
   * guard around the parse): date T time, optional fraction, mandatory
   * offset (Z or ±hh:mm). Components are range-bounded (month 01-12,
   * day 01-31, hour 00-23, minute/second 00-59, offset hour 00-23) and the
   * anchors are \\A..\\z — Java's `$` matches before a trailing newline,
   * which Go's parse rejects. Residual approximation vs the real parse:
   * per-month day counts and leap years (2024-02-31 passes the regex). */
  val Rfc3339Pattern: String =
    "\\A\\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\\d|3[01])" +
    "T([01]\\d|2[0-3]):[0-5]\\d:[0-5]\\d(\\.\\d+)?" +
    "(Z|[+-]([01]\\d|2[0-3]):[0-5]\\d)\\z"

  /** The accepting set of Go `uuid.Parse` (auto_schema.go:224-230,247-250):
   * canonical 36 (optionally urn:uuid:-prefixed or {}-braced) or raw 32 hex,
   * case-insensitive. */
  val UuidPattern: String = {
    val canon = "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
    // \A..\z, not ^..$: Java's $ accepts a trailing newline Go's parse rejects
    s"\\A(urn:uuid:)?$canon\\z|\\A\\{$canon\\}\\z|\\A[0-9a-fA-F]{32}\\z"
  }

  /**
   * Value-based inference for untyped (JSON-shaped) ingest — the reference's
   * `determineType` (auto_schema.go:232-255) applied per COLUMN: a string
   * column whose every present value parses as RFC3339 becomes `date`, every
   * value a UUID becomes `uuid`, anything else (including any mixture —
   * the array-merge rule of auto_schema.go:295-305: text ∪ {uuid,date} →
   * text) stays `text`; a value-less column takes the reference's nil
   * fallback, text. Typed columns map by physical type like [[propType]]
   * (JSON float64 → number, int64 → int, bool → boolean).
   *
   * Returns (prop, dtype) rows. One codegen'd aggregate pass over the data
   * — 3 counters per string column — then a row-per-property explode of the
   * single aggregate row; no per-column scans, no driver round-trip.
   */
  def valueDtypes(df: DataFrame, idColumn: String): DataFrame = {
    val fields = df.schema.fields.filterNot(_.name == idColumn)
    val strCols = fields.filter(_.dataType == StringType).map(_.name)
    val verdicts: Seq[org.apache.spark.sql.Column] = fields.map { f =>
      val dtype =
        if (f.dataType == StringType) {
          val c = f.name
          when(col(s"__n_$c") === 0, lit("text"))
            .when(col(s"__d_$c") === col(s"__n_$c"), lit("date"))
            .when(col(s"__u_$c") === col(s"__n_$c"), lit("uuid"))
            .otherwise(lit("text"))
        } else lit(propType(f.dataType).name)
      struct(lit(f.name).as("prop"), dtype.as("dtype"))
    }.toSeq
    if (strCols.isEmpty) {
      // purely typed input: no data pass needed at all
      df.sparkSession.range(1)
        .select(explode(array(verdicts: _*)).as("kv"))
        .select(col("kv.prop").as("prop"), col("kv.dtype").as("dtype"))
    } else {
      val aggs = strCols.flatMap(c => Seq(
        count(col(c)).as(s"__n_$c"),
        count(when(col(c).rlike(Rfc3339Pattern), 1)).as(s"__d_$c"),
        count(when(col(c).rlike(UuidPattern), 1)).as(s"__u_$c"))).toSeq
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(verdicts: _*)).as("kv"))
        .select(col("kv.prop").as("prop"), col("kv.dtype").as("dtype"))
    }
  }

  /** [[valueDtypes]] materialized into a CollectionSchema — the reference's
   * auto-schema write path for untyped payloads (string dates/uuids become
   * typed properties). The verdict row is property-count-sized. */
  def inferFromValues(name: String, df: DataFrame, idColumn: String,
                      vectors: Map[String, String] = Map.empty): CollectionSchema = {
    val vectorCols = vectors.values.toSet
    val byName = valueDtypes(df, idColumn)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val props = df.schema.fields
      .filterNot(f => f.name == idColumn || vectorCols.contains(f.name))
      .map { f =>
        val pt = byName(f.name) match {
          case "date" => PropType.Date
          case "uuid" => PropType.Uuid
          case "text" => PropType.Text
          case _      => propType(f.dataType)
        }
        Property(f.name, pt, Tokenization.Word)
      }
    CollectionSchema(name, idColumn, props.toSeq, vectors,
      defaultVector = vectors.keys.headOption)
  }

  // ==========================================================================
  // JSON-payload inference (the REST ObjectsCreate auto-schema path)
  // ==========================================================================

  /** `determineType` (auto_schema.go:232-340) for ONE decoded JSON value:
   * strings gate through the RFC3339/uuid shape checks before falling back
   * to text; json numbers take the `AUTOSCHEMA_DEFAULT_NUMBER` default
   * (number); maps are geo when they carry latitude+longitude, phone when
   * they carry input, nested object otherwise (geo/phone never nest);
   * arrays type from their elements with the text∪{uuid,date}→text merge
   * rule; beacon arrays become cross-references whose TARGET CLASSES are
   * the classes of the pointed objects (`classOfId`). Returns either the
   * PropType or the ref target class list. */
  def jsonPropType(v: org.json4s.JValue, classOfId: String => Option[String],
                   nested: Boolean = false): Either[Seq[String], PropType] = {
    import org.json4s._
    def strType(x: String): PropType =
      if (x.matches(Rfc3339Pattern)) PropType.Date
      else if (x.matches(UuidPattern)) PropType.Uuid
      else PropType.Text
    v match {
      case JString(x) => Right(strType(x))
      case JInt(_) | JLong(_) | JDouble(_) | JDecimal(_) => Right(PropType.Number)
      case JBool(_) => Right(PropType.Bool)
      case o: JObject =>
        val keys = o.obj.map(_._1).toSet
        if (!nested && keys.contains("latitude") && keys.contains("longitude"))
          Right(PropType.Geo)
        else if (!nested && keys.contains("input")) Right(PropType.Phone)
        else Right(PropType.Obj)
      case JArray(Nil) => Right(PropType.Arr(PropType.Text))
      case JArray(elems) =>
        val beacons = elems.collect { case e: JObject =>
          e.obj.collectFirst { case ("beacon", JString(b)) => b } }.flatten
        if (beacons.size == elems.size) {
          // cross-ref: each beacon's target object names a target class
          val targets = beacons.flatMap { b =>
            val id = b.split('/').last
            classOfId(id)
          }.distinct
          Left(targets)
        } else {
          val elemTypes = elems.map(e =>
            jsonPropType(e, classOfId, nested).getOrElse(PropType.Text))
          // merge rule (auto_schema.go:295-305): text absorbs uuid/date
          val merged = elemTypes.reduce[PropType] {
            case (a, b) if a == b => a
            case (PropType.Text, PropType.Uuid | PropType.Date) => PropType.Text
            case (PropType.Uuid | PropType.Date, PropType.Text) => PropType.Text
            case (PropType.Uuid, PropType.Date) | (PropType.Date, PropType.Uuid) => PropType.Text
            case (a, b) => throw new IllegalArgumentException(
              s"mismatched data type - '${a.name}' expected, got '${b.name}'")
          }
          Right(PropType.Arr(merged))
        }
      case JNull | JNothing => Right(PropType.Text) // nil fallback
      case other => throw new IllegalArgumentException(
        s"cannot auto-infer a property type from $other")
    }
  }

  /** The ObjectsCreate auto-schema step (auto_schema.go:82-191): an unseen
   * class is created from the payload's inferred properties, an existing
   * class gains the payload's UNSEEN properties (never mutating seen ones);
   * property names normalize with a lowercased first letter like the schema
   * wire. Returns the (possibly new) schema. */
  def mergeRestObject(existing: Option[CollectionSchema], className: String,
                      idColumn: String, props: Map[String, org.json4s.JValue],
                      classOfId: String => Option[String]): CollectionSchema = {
    val base = existing.getOrElse(CollectionSchema(className, idColumn, Nil))
    val inferred = props.toSeq.sortBy(_._1).flatMap { case (name0, v) =>
      val name = if (name0.isEmpty) name0 else name0.head.toLower + name0.tail
      if (base.property(name).isDefined) None
      else Some(jsonPropType(v, classOfId) match {
        case Right(pt) => Property(name, pt, Tokenization.Word)
        case Left(targets) =>
          // single-target refs keep the scalar refTarget channel; several
          // distinct classes ride refTargets (multi-class cref)
          if (targets.size <= 1)
            Property(name, PropType.Ref, refTarget = targets.headOption)
          else Property(name, PropType.Ref, refTargets = targets)
      })
    }
    base.copy(properties = base.properties ++ inferred)
  }
}
