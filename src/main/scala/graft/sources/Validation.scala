package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.model._

/**
 * Write-path property validation (reference: usecases/objects/validation/
 * properties_validation.go — every incoming object's property values are
 * checked against the schema before the write; the reference rejects the
 * whole object, a batch pipeline wants the per-row report): emits one
 * (id, property, error) row per violation, zero rows for a clean batch.
 * Error texts follow the reference's messages (dateVal:419, uuidVal:430,
 * geo/phone checks:489-545). One codegen'd scan — all checks ride a single
 * array + explode, so a 100 TB batch validates at read speed.
 */
object Validation {

  def report(df: DataFrame, schema: CollectionSchema): DataFrame = {
    val id = col(schema.idColumn)
    def entry(prop: String, error: org.apache.spark.sql.Column) =
      struct(lit(prop).as("property"), error.as("error"))
    val checks: Seq[org.apache.spark.sql.Column] =
      schema.properties.filter(p => df.columns.contains(p.name)).flatMap { p =>
        val c = col(p.name)
        p.dataType match {
          case PropType.Date if df.schema(p.name).dataType == StringType =>
            Seq(when(c.isNotNull && !c.rlike(AutoSchema.Rfc3339Pattern),
              entry(p.name, concat(
                lit("requires a string with a RFC3339 formatted date, but the given value is '"),
                c, lit("'")))))
          case PropType.Uuid if df.schema(p.name).dataType == StringType =>
            Seq(when(c.isNotNull && !c.rlike(AutoSchema.UuidPattern),
              entry(p.name, concat(
                lit("requires a string of UUID format, but the given value is '"),
                c, lit("'")))))
          case PropType.Geo =>
            val lat = c.getField("lat")
            val lon = c.getField("lon")
            Seq(
              when(c.isNotNull && (lat < -90.0 || lat > 90.0),
                entry(p.name, concat(
                  lit("invalid latitude: must be between -90 and 90, got "),
                  lat.cast("string")))),
              when(c.isNotNull && (lon < -180.0 || lon > 180.0),
                entry(p.name, concat(
                  lit("invalid longitude: must be between -180 and 180, got "),
                  lon.cast("string")))))
          case PropType.Phone if df.schema(p.name).dataType == StringType =>
            Seq(when(c.isNotNull &&
                !PhoneNumbers.normalize(c, lit(null).cast("string")).getField("valid"),
              entry(p.name, concat(lit("invalid phone number: '"), c, lit("'")))))
          case _ => Nil
        }
      }
    if (checks.isEmpty)
      // carry the schema's ACTUAL id type so both branches return the same
      // schema (a string-keyed collection must not get a long id here)
      df.sparkSession.emptyDataFrame
        .select(lit(null).cast(df.schema(schema.idColumn).dataType).as("id"),
          lit(null).cast("string").as("property"),
          lit(null).cast("string").as("error"))
        .limit(0)
    else
      df.select(id.as("id"),
          explode(filter(array(checks: _*), x => x.isNotNull)).as("v"))
        .select(col("id"), col("v.property").as("property"), col("v.error").as("error"))
  }
}
