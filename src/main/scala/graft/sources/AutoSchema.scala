package graft.sources

import org.apache.spark.sql.DataFrame
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
      .map { f =>
        val tok = if (f.dataType == StringType) Tokenization.Word else Tokenization.Word
        Property(f.name, propType(f.dataType), tok)
      }
    CollectionSchema(name, idColumn, props.toSeq, vectors,
      defaultVector = vectors.keys.headOption)
  }
}
