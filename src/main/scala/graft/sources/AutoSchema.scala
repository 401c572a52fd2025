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
}
