package graft.engine

import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model._

/**
 * Wire-format query decoder — parses weaviate's gRPC `SearchRequest` /
 * `AggregateRequest` JSON documents (protojson field naming, both
 * lowerCamelCase and the proto's snake_case accepted) into the engine's
 * `GetParams` / `AggregateParams` IR, replaying the reference's parse-time
 * validation errors verbatim.
 *
 * Reference:
 *  - adapters/handlers/grpc/v1/parse_search_request.go:81-466 (Search),
 *    509-652 (targets), 909-963 (nearText/moves), 1338-1507 (nearVector),
 *    1509-1526 (selection/MMR)
 *  - adapters/handlers/grpc/v1/filters.go:35-230 (filter clause tree,
 *    value typing + int/number coercion), 312-373 (paths old/new style),
 *    386-396 (floatToInt guards)
 *  - adapters/handlers/grpc/v1/parse_aggregate_request.go:43-352
 *    (AggregateRequest), 354-481 (per-type aggregator flags)
 *  - grpc/proto/v1/{base_search,search_get,aggregate}.proto field names
 *  - usecases/byteops/slices.go Fp32SliceFromBytes (little-endian fp32
 *    `vectorBytes` payloads, the wire encoding real clients send)
 *
 * A JSON document decoded here drives the SAME plan as the equivalent
 * programmatically-built params — the q_wire_* gates hash-match decoded
 * queries against the programmatic twins' DuckDB oracles.
 */
object WireDecoder {

  final class WireError(msg: String) extends IllegalArgumentException(msg)
  private def fail(msg: String): Nothing = throw new WireError(msg)

  // --- JSON field access (accept protojson lowerCamelCase AND proto snake_case)

  private def norm(s: String): String = s.replace("_", "").toLowerCase
  private def field(jv: JValue, name: String): Option[JValue] = jv match {
    case JObject(fields) =>
      val n = norm(name)
      fields.collectFirst { case (k, v) if norm(k) == n && v != JNull => v }
    case _ => None
  }
  private def str(jv: JValue, name: String): Option[String] =
    field(jv, name).map { case JString(s) => s; case other => fail(s"$name: expected string, got $other") }
  private def bool(jv: JValue, name: String): Boolean =
    field(jv, name).exists { case JBool(b) => b; case other => fail(s"$name: expected bool, got $other") }
  private def num(jv: JValue, name: String): Option[Double] = field(jv, name).map(asDouble(name, _))
  private def intF(jv: JValue, name: String): Option[Long] = field(jv, name).map {
    case JInt(i) => i.toLong
    case JLong(i) => i
    case JDouble(d) if d.isWhole => d.toLong
    case JString(s) => // protojson renders int64 as string
      try s.toLong catch { case _: NumberFormatException =>
        fail(s"$name: expected integer, got $s") }
    case other => fail(s"$name: expected integer, got $other")
  }
  private def asDouble(name: String, v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case other => fail(s"$name: expected number, got $other")
  }
  private def arr(jv: JValue, name: String): Option[List[JValue]] =
    field(jv, name).map { case JArray(xs) => xs; case other => fail(s"$name: expected array, got $other") }
  private def strArr(jv: JValue, name: String): Seq[String] =
    arr(jv, name).getOrElse(Nil).map { case JString(s) => s; case other => fail(s"$name: expected string array, got $other") }
  private def floatArr(name: String, xs: List[JValue]): Array[Float] =
    xs.map(v => asDouble(name, v).toFloat).toArray

  /** Enum token match: "OPERATOR_EQUAL" / "Equal" / "equal" all hit "equal". */
  private def enumIs(v: String, prefix: String, token: String): Boolean = {
    val n = norm(v.stripPrefix(prefix))
    n == norm(token)
  }

  /** Little-endian fp32 slice — the reference's byteops.Fp32SliceFromBytes,
   * the encoding protojson `vectorBytes` (base64) carries. */
  private[engine] def fp32FromBytes(bytes: Array[Byte]): Array[Float] = {
    // a truncated payload must not silently become a shorter vector — the
    // query would run against wrong dimensions instead of failing to parse
    if (bytes.length % 4 != 0)
      fail(s"vector_bytes: payload of ${bytes.length} bytes is not a whole number of fp32 values")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = bb.getFloat(i * 4); i += 1 }
    out
  }

  /** Multi-vector byte layout (reference: byteops.Fp32SliceOfSlicesFromBytes)
   * — a uint16 LE per-row dimension header, then the rows packed as LE fp32. */
  private[engine] def fp32SlicesFromBytes(bytes: Array[Byte]): Array[Array[Float]] = {
    if (bytes.isEmpty) return Array.empty
    val dim = ((bytes(0) & 0xff) | ((bytes(1) & 0xff) << 8))
    if (dim == 0) fail("vector_bytes: dimension cannot be 0")
    val body = java.util.Arrays.copyOfRange(bytes, 2, bytes.length)
    if (body.length % (dim * 4) != 0)
      fail(s"vector_bytes: payload does not pack whole $dim-dim fp32 rows")
    fp32FromBytes(body).grouped(dim).map(_.toArray).toArray
  }

  /** A vector argument: either `vector` (number list), `vectorBytes`
   * (base64 LE fp32), or `vectors: [{type, vectorBytes|vector}]` — the
   * reference's precedence is vectors > vectorBytes > vector
   * (parse_search_request.go:1343-1358); multi-fp32 byte payloads use the
   * dim-header packing of fp32SlicesFromBytes. Returns (single, multi). */
  private def extractVectorArg(jv: JValue, ctx: String): (Option[Array[Float]], Option[Array[Array[Float]]]) = {
    arr(jv, "vectors") match {
      case Some(vs) if vs.nonEmpty =>
        if (vs.size > 1) fail(s"$ctx: only 1 vector supported, found ${vs.size} vectors")
        val v = vs.head
        val isMulti = str(v, "type").exists(t => enumIs(t, "VECTOR_TYPE_", "multi_fp32"))
        if (isMulti) {
          field(v, "vector").orElse(field(v, "vectorBytes")) match {
            case Some(JArray(rows)) =>
              (None, Some(rows.map { case JArray(r) => floatArr("vectors", r)
                                     case other => fail(s"$ctx: expected nested float arrays, got $other") }.toArray))
            case Some(JString(b64)) => // wire-real payload: dim-header byte packing
              (None, Some(fp32SlicesFromBytes(Base64.getDecoder.decode(b64))))
            case _ => fail(s"$ctx: multi vector requires nested float arrays")
          }
        } else {
          val single = field(v, "vectorBytes") match {
            case Some(JString(b64)) => fp32FromBytes(Base64.getDecoder.decode(b64))
            case _ => arr(v, "vector").map(floatArr("vectors", _)).getOrElse(
              fail(s"$ctx: vectors entry carries no vector payload"))
          }
          (Some(single), None)
        }
      case _ =>
        str(jv, "vectorBytes") match {
          case Some(b64) if b64.nonEmpty => (Some(fp32FromBytes(Base64.getDecoder.decode(b64))), None)
          case _ => (arr(jv, "vector").filter(_.nonEmpty).map(floatArr("vector", _)), None)
        }
    }
  }

  // --- Go fmt %v for float64 (error-message fidelity): shortest repr, no
  // trailing ".0" on whole numbers (strconv.FormatFloat 'g' -1).
  private[engine] def goFloat(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "+Inf"
    else if (d.isNegInfinity) "-Inf"
    else if (d.isWhole && math.abs(d) < 1e21) {
      if (math.abs(d) <= Long.MaxValue.toDouble) d.toLong.toString
      else new java.math.BigDecimal(d).toBigInteger.toString
    } else {
      val s = d.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
  }
  /** Go fmt %v of a string slice: `[a b c]`. */
  private def goStrSlice(xs: Seq[String]): String = xs.mkString("[", " ", "]")

  // ==========================================================================
  // Filters (reference: filters.go ExtractFilters)
  // ==========================================================================

  private val CompoundOps = Map("and" -> WhereOp.And, "or" -> WhereOp.Or, "not" -> WhereOp.Not)
  private val LeafOps = Map(
    "equal" -> WhereOp.Equal, "notequal" -> WhereOp.NotEqual,
    "greaterthan" -> WhereOp.GreaterThan, "greaterthanequal" -> WhereOp.GreaterThanEqual,
    "lessthan" -> WhereOp.LessThan, "lessthanequal" -> WhereOp.LessThanEqual,
    "withingeorange" -> WhereOp.WithinGeoRange, "like" -> WhereOp.Like,
    "isnull" -> WhereOp.IsNull, "containsany" -> WhereOp.ContainsAny,
    "containsall" -> WhereOp.ContainsAll, "containsnone" -> WhereOp.ContainsNone)

  def decodeFilters(g: Graft, className: String, jv: JValue): Where = {
    val opRaw = str(jv, "operator").getOrElse(fail("filters: operator is required"))
    val opNorm = norm(opRaw.stripPrefix("OPERATOR_"))
    CompoundOps.get(opNorm) match {
      case Some(op) =>
        val operands = arr(jv, "filters").getOrElse(Nil).map(decodeFilters(g, className, _))
        Where(op, operands = operands)
      case None =>
        val op = LeafOps.getOrElse(opNorm, fail(s"unknown filter operator $opRaw"))
        val onPath = strArr(jv, "on")
        val path: Seq[String] = field(jv, "target") match {
          case Some(t) => decodeFilterTarget(g, className, t)
          case None =>
            if (onPath.size % 2 != 1)
              fail(s"paths needs to have a uneven number of components: property, class, property, ...., got ${goStrSlice(onPath)}")
            onPath
        }
        if (op == WhereOp.IsNull)
          return Where(op, path, Some(FilterValue.BoolV(
            field(jv, "valueBoolean").map { case JBool(b) => b; case o => fail(s"valueBoolean: $o") }.getOrElse(true))))
        val raw = decodeFilterValue(jv)
        val dt = filterDataType(g, className, path, op)
        Where(op, path, Some(coerceValue(raw, dt, op)))
    }
  }

  /** New-style FilterTarget (filters.go:325-373): property / singleTarget /
   * multiTarget / count — flattened to the engine's path encoding
   * (prop, TargetClass, prop, ...). */
  private def decodeFilterTarget(g: Graft, className: String, t: JValue): Seq[String] =
    field(t, "property") match {
      case Some(JString(p)) => Seq(p)
      case _ =>
        field(t, "singleTarget") match {
          case Some(st) =>
            val on = str(st, "on").getOrElse(fail("singleTarget: on is required"))
            val prop = g.collection(className).schema.property(on).getOrElse(
              fail(s"property $on does not exist on class $className"))
            val linked = prop.refTarget.getOrElse(
              fail(s"expected reference property with a single target, got ${prop.dataType.name} for $on "))
            val childTarget = field(st, "target").getOrElse(fail("singleTarget: target is required"))
            on +: linked +: decodeFilterTarget(g, linked, childTarget)
          case None =>
            field(t, "multiTarget") match {
              case Some(mt) =>
                val on = str(mt, "on").getOrElse(fail("multiTarget: on is required"))
                val linked = str(mt, "targetCollection").getOrElse(fail("multiTarget: targetCollection is required"))
                val childTarget = field(mt, "target").getOrElse(fail("multiTarget: target is required"))
                on +: linked +: decodeFilterTarget(g, linked, childTarget)
              case None =>
                field(t, "count") match {
                  case Some(c) => Seq(str(c, "on").getOrElse(fail("count: on is required")))
                  case None => fail(s"unknown target type $t")
                }
            }
        }
    }

  /** Typed value from the proto TestValue oneof (filters.go:129-164).
   * Array messages carry a `values` field in proto; a bare JSON array is
   * also accepted. */
  private def decodeFilterValue(jv: JValue): FilterValue = {
    import FilterValue._
    def arrayOf(name: String): Option[List[JValue]] = field(jv, name).map {
      case JArray(xs) => xs
      case o => field(o, "values") match {
        case Some(JArray(xs)) => xs
        case _ => fail(s"$name: expected array or {values: [...]}")
      }
    }
    field(jv, "valueText").map { case JString(s) => TextV(s); case o => fail(s"valueText: $o") }
      .orElse(field(jv, "valueInt").map {
        case JInt(i) => IntV(i.toLong); case JLong(i) => IntV(i)
        case JDouble(d) if d.isWhole => IntV(d.toLong)
        case JString(s) => // protojson int64-as-string
          IntV(try s.toLong catch { case _: NumberFormatException =>
            fail(s"valueInt: expected integer, got $s") })
        case o => fail(s"valueInt: $o") })
      .orElse(field(jv, "valueBoolean").map { case JBool(b) => BoolV(b); case o => fail(s"valueBoolean: $o") })
      .orElse(field(jv, "valueNumber").map(v => NumberV(asDouble("valueNumber", v))))
      .orElse(arrayOf("valueIntArray").map(xs => ListV(xs.map {
        case JInt(i) => IntV(i.toLong); case JLong(i) => IntV(i)
        case JDouble(d) if d.isWhole => IntV(d.toLong)
        case JString(s) =>
          IntV(try s.toLong catch { case _: NumberFormatException =>
            fail(s"valueIntArray: expected integer, got $s") })
        case o => fail(s"valueIntArray: $o") })))
      .orElse(arrayOf("valueTextArray").map(xs => ListV(xs.map {
        case JString(s) => TextV(s); case o => fail(s"valueTextArray: $o") })))
      .orElse(arrayOf("valueNumberArray").map(xs => ListV(xs.map(v => NumberV(asDouble("valueNumberArray", v))))))
      .orElse(arrayOf("valueBooleanArray").map(xs => ListV(xs.map {
        case JBool(b) => BoolV(b); case o => fail(s"valueBooleanArray: $o") })))
      .orElse(field(jv, "valueGeo").map { geo =>
        GeoRangeV(
          num(geo, "latitude").getOrElse(fail("valueGeo: latitude is required")),
          num(geo, "longitude").getOrElse(fail("valueGeo: longitude is required")),
          num(geo, "distance").getOrElse(fail("valueGeo: distance is required")))
      })
      .getOrElse(fail(s"unknown value type ${JsonMethods.compact(JsonMethods.render(jv))}"))
  }

  /** The leaf property's schema type, walked like filters.go
   * extractDataType/extractDataTypeProperty: metadata pseudo-props, len(),
   * ref-count single-hop, nested hops, array unwrap. */
  private def filterDataType(g: Graft, className: String, path: Seq[String], op: WhereOp): PropType = {
    val last = path.last
    if (last == "_id") return PropType.Text
    if (last == "_creationTimeUnix" || last == "_lastUpdateTimeUnix") return PropType.Date
    // "id" backwards-compat alias (filters/consts.go:17), valid whenever the
    // leaf class declares no property of its own named "id"
    if (last == "id") {
      val leafCls = if (path.size > 1) path(path.size - 2) else className
      if (g.collection(leafCls).schema.property("id").isEmpty) return PropType.Text
    }
    if (last.startsWith("len(") && last.endsWith(")")) return PropType.Int
    val leafClass = if (path.size > 1) path(path.size - 2) else className
    val schema = g.collection(leafClass).schema
    val prop = schema.property(last).getOrElse(
      fail(s"property $last does not exist on class ${schema.name}"))
    val dt = prop.dataType match {
      // single-element path on a cref = reference-count filter (filters.go:285-289)
      case PropType.Ref if path.size == 1 => PropType.Int
      case PropType.Arr(elem) => elem // array filters type against the base (filters.go:295-297)
      case other => other
    }
    // UUID is just a string at filter level (filters.go:125-127)
    if (dt == PropType.Uuid) PropType.Text else dt
  }

  private def isContains(op: WhereOp): Boolean =
    op == WhereOp.ContainsAny || op == WhereOp.ContainsAll || op == WhereOp.ContainsNone

  /** floatToInt with the reference's guards (filters.go:386-396). */
  private def floatToInt(v: Double): Long = {
    if (v.isNaN || v.isInfinite)
      fail(s"filtering for integer, but received a non-finite number ${goFloat(v)}")
    if (v < Long.MinValue.toDouble || v >= Long.MaxValue.toDouble)
      fail(s"filtering for integer, but received a value out of range ${goFloat(v)}")
    if (v != math.floor(v))
      fail(s"filtering for integer, but received a floating point number ${goFloat(v)}")
    v.toLong
  }

  /** Int/number/date coercion (filters.go:166-223 + date literals as text). */
  private def coerceValue(v: FilterValue, dt: PropType, op: WhereOp): FilterValue = {
    import FilterValue._
    (dt, v) match {
      case (PropType.Number, IntV(i)) => NumberV(i.toDouble)
      case (PropType.Number, TextV(s)) =>
        val d = try s.toDouble catch { case _: NumberFormatException =>
          fail(s"expected a number value, but could not parse string '$s' as float") }
        NumberV(d)
      case (PropType.Number, ListV(vs)) if isContains(op) =>
        ListV(vs.map { case IntV(i) => NumberV(i.toDouble); case other => other })
      case (PropType.Int, NumberV(d)) => IntV(floatToInt(d))
      case (PropType.Int, TextV(s)) =>
        val d = try s.toDouble catch { case _: NumberFormatException =>
          fail(s"expected an integer value, but could not parse string '$s' as int") }
        IntV(floatToInt(d))
      case (PropType.Int, ListV(vs)) if isContains(op) =>
        ListV(vs.map { case NumberV(d) => IntV(floatToInt(d)); case other => other })
      // digit-only text on a date target is an epoch literal (the
      // _creationTimeUnix/_lastUpdateTimeUnix ms form the reference's
      // inverted searcher parses itself) — passed through untouched
      case (PropType.Date, TextV(s)) if s.nonEmpty && s.forall(_.isDigit) => v
      case (PropType.Date, TextV(s)) => DateV(Where.utcTs(s))
      case (PropType.Date, ListV(vs)) =>
        ListV(vs.map { case TextV(s) => DateV(Where.utcTs(s)); case other => other })
      case _ => v
    }
  }

  // ==========================================================================
  // Batch objects — the WRITE wire shape (reference: adapters/handlers/grpc/
  // v1/batch/parse.go BatchObjectsFromProto + grpc/proto/v1/batch.proto):
  // objects[] of {collection, uuid, tenant, properties{nonRefProperties +
  // typed array property lists}, vector|vectorBytes|vectors[]}. Per-object
  // errors are recorded by ORIGINAL INDEX and the rest of the batch
  // proceeds — the reference's partial-batch contract.
  // ==========================================================================

  final case class BatchObject(collection: String, uuid: String,
                               tenant: Option[String],
                               properties: Map[String, Any],
                               vectors: Map[String, Array[Float]])

  /** Decode a BatchObjectsRequest JSON document. Returns the decodable
   * objects (with their original indices) and the per-index error map. */
  def decodeBatchObjects(json: String): (Seq[(Int, BatchObject)], Map[Int, String]) = {
    val jv = JsonMethods.parse(json)
    val objs = arr(jv, "objects").getOrElse(Nil)
    val errors = scala.collection.mutable.LinkedHashMap.empty[Int, String]
    val ok = scala.collection.mutable.ArrayBuffer.empty[(Int, BatchObject)]
    objs.zipWithIndex.foreach { case (o, i) =>
      try {
        val coll = str(o, "collection").getOrElse(fail("collection is required"))
        val id = str(o, "uuid").getOrElse("")
        validateUuid(id)
        val props = field(o, "properties").map(decodeObjectProps).getOrElse(Map.empty[String, Any])
        val legacy: Map[String, Array[Float]] =
          (str(o, "vectorBytes"), arr(o, "vector")) match {
            // bytes take precedence over the float list (parse.go:91-95)
            case (Some(b64), _) if b64.nonEmpty =>
              Map("" -> fp32FromBytes(Base64.getDecoder.decode(b64)))
            case (_, Some(xs)) if xs.nonEmpty => Map("" -> floatArr("vector", xs))
            case _ => Map.empty
          }
        val named: Map[String, Array[Float]] =
          arr(o, "vectors").getOrElse(Nil).map { v =>
            val name = str(v, "name").getOrElse(fail("vectors: name is required"))
            val (single, multi) = extractVectorArg(JObject(List("vectors" -> JArray(List(v)))), "batch")
            if (multi.isDefined) fail("batch: multi vectors are stored flattened per row; send single fp32")
            name -> single.getOrElse(fail(s"vectors: $name carries no vector payload"))
          }.toMap
        ok += i -> BatchObject(coll, id, str(o, "tenant").filter(_.nonEmpty),
          props, legacy ++ named)
      } catch { case e: WireError => errors(i) = e.getMessage }
    }
    (ok.toSeq, errors.toMap)
  }

  /** google/uuid Parse validation with its exact error texts (the texts the
   * reference's batch error map carries, usecases/objects/batch_add_test.go). */
  private def validateUuid(id: String): Unit = {
    if (id.length != 36) fail(s"invalid UUID length: ${id.length}")
    val ok = id.zipWithIndex.forall { case (c, idx) =>
      if (idx == 8 || idx == 13 || idx == 18 || idx == 23) c == '-'
      else (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    }
    if (!ok) fail("invalid UUID format")
  }

  private def decodeObjectProps(p: JValue): Map[String, Any] = {
    val nonRef: Map[String, Any] = field(p, "nonRefProperties") match {
      case Some(JObject(kvs)) => kvs.map { case (k, v) => k -> (v match {
        case JString(s) => (s: Any)
        case JInt(i) => i.toLong
        case JLong(l) => l
        case JDouble(d) => d
        case JDecimal(d) => d.toDouble
        case JBool(b) => b
        case other => fail(s"nonRefProperties.$k: unsupported value $other")
      })}.toMap
      case None => Map.empty
      case Some(other) => fail(s"nonRefProperties: expected object, got $other")
    }
    def arrProps(name: String)(f: PartialFunction[JValue, Any]): Map[String, Any] =
      arr(p, name).getOrElse(Nil).map { e =>
        val k = str(e, "propName").getOrElse(fail(s"$name: propName is required"))
        k -> arr(e, "values").getOrElse(Nil).map(v =>
          f.applyOrElse(v, (o: JValue) => fail(s"$name.$k: unsupported value $o")))
      }.toMap
    // number arrays may arrive as f64LE BYTES instead of a values list
    // (base.proto:17-23 values_bytes — go clients ≥5.x send bytes)
    val numberBytes: Map[String, Any] =
      arr(p, "numberArrayProperties").getOrElse(Nil).flatMap { e =>
        str(e, "valuesBytes").filter(_.nonEmpty).map { b64 =>
          val raw = Base64.getDecoder.decode(b64)
          val n = str(e, "propName").getOrElse(fail("numberArrayProperties: propName is required"))
          val vals = (0 until raw.length / 8).map { i =>
            var bits = 0L; var j = 0
            while (j < 8) { bits |= (raw(i * 8 + j) & 0xffL) << (8 * j); j += 1 }
            java.lang.Double.longBitsToDouble(bits)
          }
          n -> (vals: Any)
        }
      }.toMap
    // nested object / object[] payloads (base.proto ObjectPropertiesValue —
    // a Struct plus nested typed array messages), recursively decoded into
    // maps so the frame builder can coerce them onto the declared StructType
    def objectValue(v: JValue): Map[String, Any] = decodeObjectProps(v)
    val objectProps: Map[String, Any] =
      arr(p, "objectProperties").getOrElse(Nil).map { e =>
        val n = str(e, "propName").getOrElse(fail("objectProperties: propName is required"))
        n -> (field(e, "value").map(objectValue).getOrElse(Map.empty[String, Any]): Any)
      }.toMap
    val objectArrayProps: Map[String, Any] =
      arr(p, "objectArrayProperties").getOrElse(Nil).map { e =>
        val n = str(e, "propName").getOrElse(fail("objectArrayProperties: propName is required"))
        n -> (arr(e, "values").getOrElse(Nil).map(objectValue): Any)
      }.toMap
    nonRef ++
      arrProps("textArrayProperties") { case JString(s) => s } ++
      arrProps("intArrayProperties") {
        case JInt(i) => i.toLong; case JLong(l) => l
        case JDouble(d) if d.isWhole => d.toLong } ++
      arrProps("numberArrayProperties") {
        case JDouble(d) => d; case JInt(i) => i.toDouble
        case JLong(l) => l.toDouble; case JDecimal(d) => d.toDouble } ++
      numberBytes ++
      arrProps("booleanArrayProperties") { case JBool(b) => b } ++
      objectProps ++ objectArrayProps
  }

  /**
   * Render decoded batch objects as a DataFrame matching `target` (the
   * destination store's frame schema) for CollectionStore.upsert — the
   * engine-side analogue of the reference's models.Object build. `idColumn`
   * receives the uuid; `vectorCols` maps wire vector names to columns ("" =
   * the legacy unnamed vector → the default vector column). Missing
   * properties land as NULL (PATCH semantics belong to merge, not batch).
   */
  def batchObjectsFrame(spark: org.apache.spark.sql.SparkSession,
                        target: org.apache.spark.sql.types.StructType,
                        idColumn: String,
                        vectorCols: Map[String, String],
                        objs: Seq[BatchObject]): DataFrame = {
    import org.apache.spark.sql.types._
    // several wire names may feed one column (the legacy unnamed vector ""
    // and the default named vector both land in the default column) — a
    // plain map swap would drop all but one of them
    val namesForCol: Map[String, Seq[String]] =
      vectorCols.toSeq.groupBy(_._2).map { case (c, kvs) => c -> kvs.map(_._1) }
    def coerce(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (x: Long, IntegerType) => x.toInt
      case (x: Long, DoubleType) => x.toDouble
      case (x: Double, FloatType) => x.toFloat
      case (s: String, TimestampType) => Where.utcTs(s)
      // decoded object / object[] payloads → the declared nested StructType
      case (m: Map[_, _], st: StructType) =>
        val mm = m.asInstanceOf[Map[String, Any]]
        org.apache.spark.sql.Row.fromSeq(
          st.fields.toSeq.map(f => coerce(mm.getOrElse(f.name, null), f.dataType)))
      case (xs: Seq[_], ArrayType(et, _)) => xs.map(coerce(_, et))
      case (xs: Array[Float], ArrayType(FloatType, _)) => xs.toSeq
      case (xs: Array[Float], ArrayType(DoubleType, _)) => xs.map(_.toDouble).toSeq
      case (x, _) => x
    }
    val rows = objs.map { o =>
      org.apache.spark.sql.Row.fromSeq(target.fields.toSeq.map { f =>
        val raw: Any =
          if (f.name == idColumn) o.uuid
          else namesForCol.get(f.name) match {
            case Some(wireNames) => wireNames.flatMap(o.vectors.get).headOption.orNull
            case None => o.properties.get(f.name).orNull
          }
        coerce(raw, f.dataType)
      })
    }
    // LocalRelation (not parallelize → LogicalRDD): the optimizer then knows
    // the frame's exact size, so the store's scale-adaptive write width sees
    // a small batch as small instead of the LogicalRDD unknown-size poison
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), target)
  }

  // ==========================================================================
  // REST / GraphQL `where` trees (reference: adapters/handlers/rest/
  // filterext/parse.go + parse_value.go — the REST object/batch API and the
  // GraphQL resolvers share models.WhereFilter: CASE-SENSITIVE Pascal-case
  // operator strings, `operands` nesting, leaf `path` + EXACTLY ONE
  // value<Type> field; error texts replayed verbatim including the
  // reference's per-level "invalid where filter:" / "operand %d:" wrapping)
  // ==========================================================================

  private val RestOps = Map(
    "Equal" -> WhereOp.Equal, "Like" -> WhereOp.Like,
    "LessThan" -> WhereOp.LessThan, "LessThanEqual" -> WhereOp.LessThanEqual,
    "GreaterThan" -> WhereOp.GreaterThan, "GreaterThanEqual" -> WhereOp.GreaterThanEqual,
    "NotEqual" -> WhereOp.NotEqual, "WithinGeoRange" -> WhereOp.WithinGeoRange,
    "And" -> WhereOp.And, "Or" -> WhereOp.Or, "IsNull" -> WhereOp.IsNull,
    "ContainsAny" -> WhereOp.ContainsAny, "ContainsAll" -> WhereOp.ContainsAll,
    "ContainsNone" -> WhereOp.ContainsNone, "Not" -> WhereOp.Not)

  // the reference's extractor ORDER (parse_value.go valueExtractors): the
  // first matching field wins the type; a second match is the
  // more-than-one-values error
  private val RestValueFields = Seq(
    "valueInt", "valueNumber", "valueText", "valueDate", "valueBoolean",
    "valueIntArray", "valueNumberArray", "valueTextArray", "valueDateArray",
    "valueBooleanArray", "valueGeoRange", "valueString", "valueStringArray")

  /** Parse a REST/GraphQL `where` JSON document scoped to `collection`. */
  def restWhere(g: Graft, collection: String, json: String): Where =
    restParse(g, collection, JsonMethods.parse(json))

  private[engine] def restParse(g: Graft, collection: String, jv: JValue): Where = {
    // operator match is exact-case ("equal" is unrecognized — parseOperator
    // switches on the model's Pascal-case constants), and its error is NOT
    // wrapped; value/nested errors gain "invalid where filter:" per level
    val opName = str(jv, "operator").getOrElse("")
    val op = RestOps.getOrElse(opName, fail(s"unrecognized operator: $opName"))
    try {
      if (op == WhereOp.And || op == WhereOp.Or || op == WhereOp.Not)
        restNested(g, collection, jv, opName, op)
      else restLeaf(g, collection, jv, opName, op)
    } catch { case e: WireError => fail(s"invalid where filter: ${e.getMessage}") }
  }

  private def restNested(g: Graft, collection: String, jv: JValue,
                         opName: String, op: WhereOp): Where = {
    if (field(jv, "path").isDefined)
      fail(s"operator '$opName' not compatible with field 'path', remove 'path' " +
        "or switch to compare operator (eg. Equal, NotEqual, etc.)")
    if (RestValueFields.exists(f => field(jv, f).isDefined))
      fail(s"operator '$opName' not compatible with field 'value<Type>', " +
        "remove value field or switch to compare operator " +
        "(eg. Equal, NotEqual, etc.)")
    val operands = arr(jv, "operands").getOrElse(Nil)
    if (operands.isEmpty)
      fail(s"operator '$opName', but no operands set - add at least one operand")
    Where(op, operands = operands.zipWithIndex.map { case (o, i) =>
      try restParse(g, collection, o)
      catch { case e: WireError => fail(s"operand $i: ${e.getMessage}") }
    })
  }

  private def restLeaf(g: Graft, collection: String, jv: JValue,
                       opName: String, op: WhereOp): Where = {
    // value first, then path — parseValueFilter's own order
    val present = RestValueFields.filter(f => field(jv, f).isDefined)
    val raw: FilterValue = present match {
      case Seq() => fail(s"got operator '$opName', but no value<Type> field set")
      case Seq(one) => restValue(one, jv)
      case _ => fail("found more than one values the clause " +
        s"'${JsonMethods.compact(JsonMethods.render(jv))}'")
    }
    val path = strArr(jv, "path")
    if (path.isEmpty) fail("field 'path': must have at least one element")
    if (op == WhereOp.IsNull) Where(op, path, Some(raw))
    else Where(op, path, Some(coerceValue(raw, filterDataType(g, collection, path, op), op)))
  }

  private def restValue(fieldName: String, jv: JValue): FilterValue = {
    import FilterValue._
    def list(f: JValue => FilterValue): FilterValue = ListV(
      arr(jv, fieldName).getOrElse(Nil).map(f))
    fieldName match {
      case "valueInt" => IntV(intF(jv, "valueInt").get)
      case "valueNumber" => NumberV(num(jv, "valueNumber").get)
      case "valueText" | "valueString" | "valueDate" =>
        TextV(str(jv, fieldName).get) // dates coerce to DateV via the schema type
      case "valueBoolean" => field(jv, "valueBoolean") match {
        case Some(JBool(b)) => BoolV(b)
        case o => fail(s"valueBoolean: $o")
      }
      case "valueIntArray" => list {
        case JInt(i) => IntV(i.toLong); case JLong(i) => IntV(i)
        case JDouble(d) if d.isWhole => IntV(d.toLong)
        case o => fail(s"valueIntArray: $o")
      }
      case "valueNumberArray" => list(v => NumberV(asDouble("valueNumberArray", v)))
      case "valueTextArray" | "valueStringArray" | "valueDateArray" => list {
        case JString(s) => TextV(s); case o => fail(s"$fieldName: $o")
      }
      case "valueBooleanArray" => list {
        case JBool(b) => BoolV(b); case o => fail(s"valueBooleanArray: $o")
      }
      case "valueGeoRange" =>
        val gr = field(jv, "valueGeoRange").get
        // nil-check order is the reference's: distance, then its magnitude,
        // then geoCoordinates
        val dist = field(gr, "distance").getOrElse(
          fail("valueGeoRange: field 'distance' must be set"))
        val max = num(dist, "max").getOrElse(0.0)
        if (max < 0) fail("valueGeoRange: field 'distance.max' must be a positive number")
        val gc = field(gr, "geoCoordinates").getOrElse(
          fail("valueGeoRange: field 'geoCoordinates' must be set"))
        GeoRangeV(num(gc, "latitude").getOrElse(0.0),
          num(gc, "longitude").getOrElse(0.0), max)
      case other => fail(s"unknown value field $other")
    }
  }

  // ==========================================================================
  // Backup request wire (POST /v1/backups/{backend} —
  // usecases/backup/scheduler.go validateBackupRequest:641-700 +
  // expandWildcards:1067-1097, handler.go validateID:383-388)
  // ==========================================================================

  final case class BackupRequestParams(
      id: String,
      backend: String,
      /** include/exclude resolved (wildcards expanded, exclusions applied)
       * against the engine's registered collections — the concrete class
       * list the backup runs over. */
      classes: Seq[String])

  private val BackupIdRe = "^[a-z0-9_-]+$".r

  private def validateBackupId(id: String): Unit =
    if (!BackupIdRe.matches(id))
      fail(s"invalid backup id: '$id' allowed characters are lowercase, 0-9, _, -")

  /** `*`/`?` glob over candidate class names (scheduler.go matchesWildcard);
   * non-wildcard patterns pass through verbatim, order preserved, deduped. */
  private def expandWildcards(patterns: Seq[String], candidates: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    patterns.foreach { p =>
      if (p.exists(c => c == '*' || c == '?')) {
        val re = p.flatMap {
          case '*' => ".*"
          case '?' => "."
          case c => java.util.regex.Pattern.quote(c.toString)
        }.r
        candidates.foreach(c => if (re.matches(c)) seen += c)
      } else seen += p
    }
    seen.toSeq
  }

  def decodeBackupRequest(g: Graft, backend: String, json: String): BackupRequestParams = {
    val jv = JsonMethods.parse(json)
    val id = str(jv, "id").getOrElse("")
    validateBackupId(id)
    str(jv, "baseBackupId").filter(_.nonEmpty).foreach { base =>
      try validateBackupId(base)
      catch { case e: WireError => fail(s"base backup id: ${e.getMessage}") }
      if (id == base)
        fail(s"base backup cannot be the same as the new backup ID: $base")
    }
    val include = strArr(jv, "include")
    val exclude = strArr(jv, "exclude")
    if (include.nonEmpty && exclude.nonEmpty)
      fail("malformed request: 'include' and 'exclude' cannot both contain values")
    // include-only, like the reference (scheduler.go:661 runs findDuplicate
    // on Include alone; a duplicated exclude entry is accepted there too)
    include.diff(include.distinct).headOption.foreach(dup =>
      fail(s"class list 'include' contains duplicate: $dup"))
    val allClasses = g.collectionNames
    if (allClasses.isEmpty)
      fail("no available classes to backup, there's nothing to do here")
    val inc = expandWildcards(include, allClasses)
    val exc = expandWildcards(exclude, allClasses).toSet
    // reference quirk replicated (scheduler.go:673-681): the include-vs-all
    // branch tests the EXPANDED list, so a wildcard include matching nothing
    // falls back to ALL classes rather than erroring
    val base = if (inc.nonEmpty) inc else allClasses
    val classes = base.filterNot(exc.contains)
    if (classes.isEmpty)
      fail(s"empty class list: please choose from : ${goStrSlice(allClasses)}")
    // Backupable gate (adapters/repos/db/backup.go:65-77): pass-through
    // non-wildcard names must exist BEFORE any backup work starts — without
    // this the error surfaces mid-export after a partial backup is written
    classes.find(c => !g.hasCollection(c)).foreach(c =>
      fail(s"class $c doesn't exist"))
    BackupRequestParams(id, backend, classes)
  }

  /** Restore request (POST /v1/backups/{backend}/{id}/restore —
   * scheduler.go validateRestoreRequest:761-830): include/exclude resolve
   * against the BACKUP's own class list; the not-in-backup error keeps the
   * reference's trailing ": " quirk. The manifest-level arms (missing id,
   * wrong descriptor, version checks) live with the store's backup gates —
   * this decodes the request body against a known class list. */
  def decodeRestoreRequest(backupClasses: Seq[String], json: String): Seq[String] = {
    val jv = JsonMethods.parse(json)
    val include = strArr(jv, "include")
    val exclude = strArr(jv, "exclude")
    if (include.nonEmpty && exclude.nonEmpty)
      fail("malformed request: 'include' and 'exclude' cannot both contain values")
    include.diff(include.distinct).headOption.foreach(dup =>
      fail(s"class list 'include' contains duplicate: $dup"))
    val inc = expandWildcards(include, backupClasses)
    val exc = expandWildcards(exclude, backupClasses).toSet
    // same expanded-list quirk as the create path (validateRestoreRequest:
    // 815-821): a no-match wildcard include flows into the else branch and
    // restores everything — replicated, not fixed
    val classes =
      if (inc.nonEmpty) {
        inc.find(c => !backupClasses.contains(c)).foreach(missing =>
          fail(s"class $missing doesn't exist in the backup, but does have ${goStrSlice(backupClasses)}: "))
        inc
      } else backupClasses.filterNot(exc.contains)
    if (classes.isEmpty)
      fail(s"nothing left to restore: please choose from : ${goStrSlice(backupClasses)}")
    classes
  }

  // ==========================================================================
  // Batch delete wire (gRPC BatchDeleteRequest —
  // adapters/handlers/grpc/v1/batch_delete.go:27-69; the verbose/minimal
  // output split and dryRun ride through to the store's deleteWhere)
  // ==========================================================================

  final case class BatchDeleteParams(
      collection: String,
      where: Where,
      dryRun: Boolean,
      verbose: Boolean,
      tenant: Option[String])

  def decodeBatchDelete(g: Graft, json: String): BatchDeleteParams = {
    val jv = JsonMethods.parse(json)
    val collection = str(jv, "collection").getOrElse("")
    if (!g.hasCollection(collection))
      fail(s"could not find class $collection in schema")
    val filters = field(jv, "filters").getOrElse(
      fail("no filters in batch delete request"))
    BatchDeleteParams(
      collection = collection,
      where = decodeFilters(g, collection, filters),
      dryRun = bool(jv, "dryRun"),
      verbose = bool(jv, "verbose"),
      tenant = str(jv, "tenant"))
  }

  // ==========================================================================
  // Classification wire (POST /v1/classifications —
  // usecases/classification/classifier.go Schedule:151-167 (settings parse
  // BEFORE validation, type default "knn", k default 3) +
  // validation.go:43-174 (first-error wins under the "invalid
  // classification:" wrap))
  // ==========================================================================

  /** Decoded classification job params (models.Classification). */
  final case class ClassificationParams(
      collection: String,
      tpe: String,                       // "knn" | "zeroshot" | "text2vec-contextionary-contextual"
      basedOnProperty: String,
      classifyProperties: Seq[String],
      k: Int,
      sourceWhere: Option[Where] = None,
      trainingSetWhere: Option[Where] = None,
      targetWhere: Option[Where] = None)

  def decodeClassification(g: Graft, json: String): ClassificationParams = {
    val jv = JsonMethods.parse(json)
    val tpe = str(jv, "type").getOrElse("knn")
    if (tpe != "knn" && tpe != "zeroshot" && tpe != "text2vec-contextionary-contextual")
      fail(s"unsupported classification type '$tpe'")

    // settings parse FIRST (Schedule:157 before the validator)
    val k: Int = if (tpe != "knn") 3 else field(jv, "settings") match {
      case None | Some(JNull) => 3
      case Some(o: JObject) => field(o, "k") match {
        case None => 3
        case Some(JInt(v)) => v.toInt
        case Some(JLong(v)) => v.toInt
        case Some(JDouble(v)) if v.isWhole => v.toInt
        case Some(other) => fail("parse knn specific settings: " +
          s"settings.k must be number, got ${goJsonType(other)}")
      }
      case Some(other) => fail("parse knn specific settings: " +
        s"settings must be an object got ${goJsonType(other)}")
    }

    def invalid(msg: String): Nothing = fail(s"invalid classification: $msg")
    val collection = str(jv, "class").getOrElse("")
    if (collection.isEmpty) invalid("class must be set")
    if (!g.hasCollection(collection)) invalid(s"class '$collection' not found in schema")
    val schema = g.collection(collection).schema

    val filters = field(jv, "filters")
    def where(name: String): Option[Where] =
      filters.flatMap(f => field(f, name)).map(restParse(g, collection, _))
    if (tpe == "text2vec-contextionary-contextual" &&
        filters.exists(f => field(f, "trainingSetWhere").isDefined))
      invalid("type is 'text2vec-contextionary-contextual', but 'trainingSetWhere' " +
        "filter is set, for 'text2vec-contextionary-contextual' there is no training " +
        "data, instead limit possible target data directly through setting 'targetWhere'")
    if (tpe == "knn" && filters.exists(f => field(f, "targetWhere").isDefined))
      invalid("type is 'knn', but 'targetWhere' filter is set, for 'knn' you cannot " +
        "limit target data directly, instead limit training data through setting 'trainingSetWhere'")

    val basedOn = strArr(jv, "basedOnProperties")
    if (basedOn.isEmpty) invalid("basedOnProperties must have at least one property")
    if (basedOn.size > 1)
      invalid("only a single property in basedOnProperties supported at the moment, " +
        s"got ${goStrSlice(basedOn)}")
    val bprop = schema.property(basedOn.head).getOrElse(
      invalid(s"basedOnProperties: property '${basedOn.head}' does not exist"))
    if (bprop.dataType != PropType.Text)
      invalid(s"basedOnProperties: property '${basedOn.head}' must be of type 'text'")

    val classify = strArr(jv, "classifyProperties")
    if (classify.isEmpty) invalid("classifyProperties must have at least one property")
    classify.foreach { p =>
      val cp = schema.property(p).getOrElse(
        invalid(s"classifyProperties: property '$p' does not exist"))
      if (cp.dataType != PropType.Ref)
        invalid(s"classifyProperties: property '$p' must be of reference type (cref)")
    }

    ClassificationParams(collection, tpe, basedOn.head, classify, k,
      sourceWhere = where("sourceWhere"),
      trainingSetWhere = where("trainingSetWhere"),
      targetWhere = where("targetWhere"))
  }

  /** Go's %T for the JSON-decoded value encoding/json would have produced. */
  private def goJsonType(v: JValue): String = v match {
    case _: JBool => "bool"
    case _: JString => "string"
    case _: JInt | _: JLong | _: JDouble => "json.Number"
    case _: JArray => "[]interface {}"
    case _: JObject => "map[string]interface {}"
    case _ => "<nil>"
  }

  // ==========================================================================
  // Batch references wire (POST /v1/batch/references —
  // usecases/objects/batch_references_add.go validateReference:259-299 +
  // joinErrors:424-437; beacon grammar entities/schema/crossref:
  // crossref_source.go ParseSource:53-93, crossref.go Parse:43-73)
  // ==========================================================================

  /** One decoded reference edge: source (class, id, property) → target
   * (optional class for the short-form beacon, id lowercased like the
   * reference's post-parse fold). */
  final case class BatchRefEdge(fromClass: String, fromId: String, property: String,
                                toClass: Option[String], toId: String,
                                tenant: Option[String])

  private[engine] val UuidRe =
    "(?i)^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r

  /** weaviate beacon → (host, path) — url.Parse's pieces this grammar uses. */
  private def beaconParts(uri: String): (String, String) = {
    val idx = uri.indexOf("://")
    if (idx < 0) ("", uri)
    else {
      val rest = uri.substring(idx + 3)
      val slash = rest.indexOf('/')
      if (slash < 0) (rest, "") else (rest.substring(0, slash), rest.substring(slash))
    }
  }

  /** crossref_source.go ParseSource — long-form source beacon
   * '/<className>/<uuid>/<propertyName>'. Replays the reference's segment
   * bug verbatim: the uuid error message prints the PROPERTY segment. */
  private def parseSourceBeacon(uri: String): (String, String, String, String) = {
    val (host, path) = beaconParts(uri)
    val segments = path.split("/", -1)
    if (segments.length != 4)
      fail("invalid cref URI: must use long-form: path must be of format " +
        s"'/<className>/<uuid>/<propertyName>', but got '$path'")
    if (!UuidRe.matches(segments(2)))
      fail(s"invalid cref URI: 2nd path segment must be uuid, but got '${segments(3)}'")
    val cls = segments(1)
    if (cls.isEmpty) fail("className cannot be empty")
    if (cls.head.isLower) fail(s"className must start with an uppercase letter, but got $cls")
    if (segments(3).isEmpty) fail("property cannot be empty")
    (host, cls, segments(2), segments(3))
  }

  /** crossref.go Parse — target beacon '[<class>/]<uuid>'. The segment-index
   * rendering keeps the reference's "%dnd" quirk ("1nd" for the short form). */
  private def parseTargetBeacon(uri: String): (String, Option[String], String) = {
    val (host, path) = beaconParts(uri)
    val segments = path.split("/", -1)
    val (cls, id, idx) = segments.length match {
      case 3 => (Some(segments(1)), segments(2), 2)
      case 2 => (None, segments(1), 1)
      case _ => fail(
        s"invalid cref URI: path must be of format '<class>/<uuid>', but got '$path'")
    }
    if (!UuidRe.matches(id))
      fail(s"invalid cref URI: ${idx}nd path segment must be uuid, but got '$id'")
    (host, cls, id.toLowerCase)
  }

  /** Decode a batch-references JSON array (`[{"from": beacon, "to": beacon,
   * "tenant"?}]`) → per-index decoded edges + per-index error texts, exactly
   * like [[decodeBatchObjects]]'s partial-batch contract. */
  def decodeBatchReferences(json: String)
      : (Seq[(Int, BatchRefEdge)], Map[Int, String]) = {
    val items = JsonMethods.parse(json) match {
      case JArray(xs) => xs
      case o => fail(s"references: expected a list, got ${JsonMethods.compact(JsonMethods.render(o))}")
    }
    if (items.isEmpty)
      fail("length cannot be 0, need at least one reference for batching")
    val good = Seq.newBuilder[(Int, BatchRefEdge)]
    var errs = Map.empty[Int, String]
    items.zipWithIndex.foreach { case (r, i) =>
      val msgs = Seq.newBuilder[String]
      val src =
        try Some(parseSourceBeacon(str(r, "from").getOrElse("")))
        catch { case e: WireError => msgs += e.getMessage; None }
      src.foreach { case (host, _, _, _) =>
        if (host != "localhost")
          msgs += s"source class must always point to the local peer, but got $host"
      }
      val tgt =
        try Some(parseTargetBeacon(str(r, "to").getOrElse("")))
        catch { case e: WireError => msgs += e.getMessage; None }
      tgt.foreach { case (host, _, _) =>
        if (host != "localhost")
          msgs += "importing network references in batch is not possible. " +
            s"Please perform a regular non-batch import for network references, got peer $host"
      }
      val all = msgs.result()
      if (all.nonEmpty) errs += i -> all.mkString(", ")
      else {
        val (_, cls, id, prop) = src.get
        val (_, toCls, toId) = tgt.get
        good += i -> BatchRefEdge(cls, id, prop, toCls, toId, str(r, "tenant"))
      }
    }
    (good.result(), errs)
  }

  // ==========================================================================
  // Tenants wire (POST/PUT /v1/schema/{class}/tenants —
  // usecases/schema/tenant.go validateTenants:118-143 +
  // validateActivityStatuses:145-184, convertNewTenantNames:414-425)
  // ==========================================================================

  /** Decode a tenants JSON array (`[{"name": ..., "activityStatus": ...}]`)
   * with the reference's validation replayed verbatim. `forCreate` selects
   * the AddTenants rules (allowEmpty=true, allowFrozen=false) vs the
   * UpdateTenants rules (allowEmpty=false, allowFrozen=true); the engine's
   * built-in offload stands in for the offload-s3 module, so FROZEN on
   * update is legal while FROZEN on create replays the invalid-status text. */
  def decodeTenants(json: String, forCreate: Boolean): Seq[Tenant] = {
    val items = JsonMethods.parse(json) match {
      case JArray(xs) => xs
      case o => fail(s"tenants: expected a list, got ${JsonMethods.compact(JsonMethods.render(o))}")
    }
    if (items.size > 100)
      fail("maximum number of tenants allowed to be updated simultaneously is 100. " +
        "Please reduce the number of tenants in your request and try again")
    val seen = scala.collection.mutable.Set.empty[String]
    val parsed = items.zipWithIndex.map { case (t, i) =>
      val name = str(t, "name").getOrElse("")
      tenantNameError(name).foreach(msg => fail(s"tenant name at index $i: $msg"))
      if (!seen.add(name)) fail(s"tenant name $name existed multiple times")
      (name, str(t, "activityStatus").getOrElse(""))
    }
    // statuses validate AFTER names/dups, all violations joined in ONE error
    val msgs = parsed.flatMap { case (name, raw) =>
      // convertNewTenantNames folds the modern aliases onto the legacy enum
      val norm = raw match {
        case "ACTIVE" => "HOT"
        case "INACTIVE" => "COLD"
        case "OFFLOADED" => "FROZEN"
        case other => other
      }
      norm match {
        case "HOT" | "COLD" => None
        case "FROZEN" if !forCreate => None
        case "" if forCreate => None
        case _ => Some(s"""invalid activity status '$norm' for tenant "$name"""")
      }
    }
    if (msgs.nonEmpty) fail(msgs.mkString(", "))
    parsed.map { case (name, raw) =>
      Tenant(name, if (raw.isEmpty) TenantStatus.Active else TenantStatus.parse(raw))
    }
  }

  /** ValidateTenantName's message (validation.go:219-233) — empty has its
   * own short form, the invalid form keeps the reference's leading space.
   * SINGLE source of the contract: Graft.addTenants' creation-path
   * validation calls this same helper. */
  private[engine] def tenantNameError(name: String): Option[String] =
    if (name.isEmpty) Some("empty tenant name")
    else if (!name.matches("[A-Za-z0-9\\-_]{1,64}"))
      Some(s" '$name' is not a valid tenant name. should only contain " +
        "alphanumeric characters (a-z, A-Z, 0-9), underscore (_), and " +
        "hyphen (-), with a length between 1 and 64 characters")
    else None

  // ==========================================================================
  // Targets / combination (parse_search_request.go:509-652)
  // ==========================================================================

  private def decodeTargets(jv: JValue): (Seq[String], Option[TargetCombination]) =
    field(jv, "targets") match {
      case Some(t) =>
        val tvs = strArr(t, "targetVectors")
        val weightsList = arr(t, "weightsForTargets").getOrElse(Nil)
        def manualWeights(): Seq[Double] = {
          if (weightsList.size != tvs.size)
            fail(s"number of weights (${weightsList.size}) does not match number of targets (${tvs.size})")
          weightsList.zipWithIndex.map { case (w, i) =>
            val target = str(w, "target").getOrElse(fail("weightsForTargets: target is required"))
            // POSITIONAL match is the reference's own rule (extractWeights,
            // parse_search_request.go:645-648: v.Target != in.TargetVectors[i]
            // rejects out-of-order entries despite the membership-sounding
            // text) — which is also what lets the SAME target name appear
            // twice with different weights (grpc_search_test.go)
            if (target != tvs(i)) fail(s"target vector $target not found in target vectors")
            num(w, "weight").getOrElse(fail("weightsForTargets: weight is required"))
          }
        }
        val combo = str(t, "combination") match {
          case None => TargetCombination.Minimum // UNSPECIFIED → default (dto.go:41)
          case Some(c) =>
            val cn = norm(c.stripPrefix("COMBINATION_METHOD_").stripPrefix("TYPE_"))
            cn match {
              case "typeaverage" | "average" => TargetCombination.Average
              case "typesum" | "sum" => TargetCombination.Sum
              case "typemin" | "min" | "minimum" => TargetCombination.Minimum
              case "typemanual" | "manual" => TargetCombination.ManualWeights(manualWeights())
              case "typerelativescore" | "relativescore" => TargetCombination.RelativeScore(manualWeights())
              case "unspecified" => TargetCombination.Minimum
              case _ => fail(s"unknown combination method $c")
            }
        }
        (tvs, Some(combo))
      case None =>
        val tvs = strArr(jv, "targetVectors")
        // >1 targets without explicit Targets → default combination (Minimum)
        (tvs, if (tvs.size > 1) Some(TargetCombination.Minimum) else None)
    }

  // ==========================================================================
  // Search legs
  // ==========================================================================

  private def checkDistCert(jv: JValue, ctx: String): (Option[Double], Option[Double]) = {
    val dist = num(jv, "distance")
    val cert = num(jv, "certainty")
    if (dist.isDefined && cert.isDefined) fail(s"$ctx: cannot provide distance and certainty")
    (dist, cert)
  }

  /** Per-target-position raw payload before unrolling — the reference's
   * `models.Vector` union plus the several-multi-vecs case extractVectors
   * can produce ([]float32 | [][]float32 | [][][]float32). The [][]float32
   * shape is AMBIGUOUS until paired with its target: one multi-vector query
   * for a ColBERT target, or a list of independent single queries for a
   * regular target (parse_search_request.go:1448-1476). */
  private sealed trait RawVec
  private final case class Raw1(v: Array[Float]) extends RawVec
  private final case class Raw2(vs: Array[Array[Float]]) extends RawVec
  private final case class Raw3(vs: Seq[Array[Array[Float]]]) extends RawVec

  /** extractVectors (parse_search_request.go:1568-1589): each entry is a
   * single or multi payload; if ANY multi entries exist the result is the
   * multi list (singles silently dropped, like the reference). */
  private def extractVectorsList(vs: Seq[JValue], ctx: String): RawVec = {
    val singles = Seq.newBuilder[Array[Float]]
    val multis = Seq.newBuilder[Array[Array[Float]]]
    vs.foreach { v =>
      val isMulti = str(v, "type").exists(t => enumIs(t, "VECTOR_TYPE_", "multi_fp32"))
      if (isMulti) {
        field(v, "vector").orElse(field(v, "vectorBytes")) match {
          case Some(JArray(rows)) =>
            multis += rows.map { case JArray(r) => floatArr(ctx, r)
                                 case other => fail(s"$ctx: expected nested float arrays, got $other") }.toArray
          case Some(JString(b64)) => multis += fp32SlicesFromBytes(Base64.getDecoder.decode(b64))
          case _ => fail(s"$ctx: multi vector requires nested float arrays")
        }
      } else {
        singles += (field(v, "vectorBytes") match {
          case Some(JString(b64)) => fp32FromBytes(Base64.getDecoder.decode(b64))
          case _ => arr(v, "vector").map(floatArr(ctx, _)).getOrElse(
            fail(s"$ctx: vectors entry carries no vector payload"))
        })
      }
    }
    val m = multis.result()
    if (m.nonEmpty) { if (m.size == 1) Raw2(m.head) else Raw3(m) }
    else {
      val s = singles.result()
      if (s.size == 1) Raw1(s.head) else Raw2(s.toArray)
    }
  }

  /** nearVector (parse_search_request.go:126-149 + parseNearVec 1338-1507).
   * `isMulti` answers isTargetVectorMultiVector for the class; `targetsIn`
   * is the hybrid path, whose Targets live on the Hybrid message. Faithful
   * to the reference's three payload shapes and its UNROLLING: a MULTI_FP32
   * payload against a regular target becomes one Single query per row,
   * against a multi-vector target one MaxSim query; target names repeat per
   * unrolled position. */
  private def decodeNearVector(jv: JValue, isMulti: String => Boolean = _ => false,
      targetsIn: Option[(Seq[String], Option[TargetCombination])] = None)
      : Either[NearVector, NearMultiVector] = {
    val (tvs, combo) = targetsIn.getOrElse(decodeTargets(jv))
    val (single, multi) = extractVectorArg(jv, "near_vector")
    val (dist, cert) = checkDistCert(jv, "near_vector")
    if ((single.isDefined || multi.isDefined) && field(jv, "vectorPerTarget").isDefined)
      fail("near_vector: either vector or VectorPerTarget must be provided, not both")

    // no explicit targets: the legacy single-space paths (parseNearVec's
    // len(targetVectors) == 0 passthrough)
    if (tvs.isEmpty) {
      multi match {
        case Some(m) => return Right(NearMultiVector(m, targetVectors = Nil))
        case None =>
          single match {
            case Some(v) =>
              return Left(NearVector(v, metric = Metric.Default,
                distance = dist, certainty = cert))
            case None =>
              if (field(jv, "vectorForTargets").isEmpty && field(jv, "vectorPerTarget").isEmpty)
                fail("near_vector: vector is required")
          }
      }
    }
    val targetsTmp0 = if (tvs.isEmpty) Seq("") else tvs

    // resolve each position's raw payload (pre-unroll)
    val (targetsTmp, raw): (Seq[String], Seq[RawVec]) =
      if (single.isDefined || multi.isDefined) {
        // one top-level vector broadcast to every target, type-checked per
        // target (parse_search_request.go:1372-1385)
        val payload: RawVec = multi.map(Raw2(_): RawVec).getOrElse(Raw1(single.get))
        targetsTmp0.foreach { t =>
          (multi.isDefined, isMulti(t)) match {
            case (true, false) => fail("near_vector: provided vector is a multi vector but vector index supports regular vectors")
            case (false, true) => fail("near_vector: provided vector is a regular vector but vector index supports multi vectors")
            case _ => ()
          }
        }
        (targetsTmp0, targetsTmp0.map(_ => payload))
      } else field(jv, "vectorForTargets") match {
        case Some(JArray(vfts)) =>
          // new shape (per-VFT Vectors lists) dedupes the target list; the
          // legacy vector_bytes shape stays positional — repeated names
          // allowed (parse_search_request.go:1386-1404)
          val newShape = vfts.nonEmpty && arr(vfts.head, "vectors").exists(_.nonEmpty)
          val eff = if (newShape) targetsTmp0.distinct else targetsTmp0
          if (vfts.size != eff.size)
            fail("near_vector: vector for target must have the same lengths as target vectors")
          val names = vfts.map(v => str(v, "name").getOrElse(fail("vectorForTargets: name is required")))
          val payloads = eff.zipWithIndex.map { case (t, i) =>
            if (names(i) != t)
              fail(s"near_vector: vector for target $t is required. All target vectors: ${goStrSlice(eff)} all vectors for targets ${goStrSlice(names)}")
            arr(vfts(i), "vectors") match {
              case Some(vs) if vs.nonEmpty => extractVectorsList(vs, "near_vector")
              case _ => Raw1(str(vfts(i), "vectorBytes")
                .map(b64 => fp32FromBytes(Base64.getDecoder.decode(b64)))
                .orElse(arr(vfts(i), "vector").map(floatArr("vectorForTargets", _)))
                .getOrElse(fail("near_vector: vector is required")))
            }
          }
          (eff, payloads)
        case _ =>
          field(jv, "vectorPerTarget") match {
            case Some(JObject(kvs)) =>
              val m = kvs.toMap
              if (m.size != targetsTmp0.size)
                fail("near_vector: vector per target must be provided for all targets")
              (targetsTmp0, targetsTmp0.map { t =>
                m.get(t) match {
                  case Some(JArray(xs)) => Raw1(floatArr("vectorPerTarget", xs))
                  case Some(JString(b64)) => Raw1(fp32FromBytes(Base64.getDecoder.decode(b64)))
                  case _ =>
                    fail(s"near_vector: vector for target $t is required. All target vectors: ${goStrSlice(targetsTmp0)} all vectors for targets ${goStrSlice(m.keys.toSeq)}")
                }
              })
            case _ => fail("near_vector: vector is required")
          }
      }

    // unroll into per-position queries (parse_search_request.go:1448-1476):
    // a multi payload against a regular target explodes into one Single per
    // row; against a multi-vector target it is one MaxSim query
    val detected: Seq[(String, TargetQuery)] = targetsTmp.zip(raw).flatMap {
      case (t, Raw3(multis)) =>
        multis.flatMap { mv =>
          if (isMulti(t)) Seq(t -> TargetQuery.Multi(mv))
          else mv.map(row => t -> (TargetQuery.Single(row): TargetQuery)).toSeq
        }
      case (t, Raw2(m)) =>
        if (isMulti(t)) Seq(t -> TargetQuery.Multi(m))
        else m.map(row => t -> (TargetQuery.Single(row): TargetQuery)).toSeq
      case (t, Raw1(v)) => Seq(t -> TargetQuery.Single(v))
    }

    if (detected.size == 1 && detected.head._2.isMulti)
      // a single multi-vector query stays on the dedicated MaxSim leg
      Right(NearMultiVector(detected.head._2.asInstanceOf[TargetQuery.Multi].vs,
        targetVectors = Seq(detected.head._1)))
    else {
      val anchor = detected.collectFirst { case (_, TargetQuery.Single(v)) => v }
        .getOrElse(detected.head._2.asInstanceOf[TargetQuery.Multi].vs.head)
      Left(NearVector(
        vector = anchor,
        metric = Metric.Default,
        distance = dist, certainty = cert,
        targetVectors = detected.map(_._1),
        combination = combo.getOrElse(TargetCombination.Minimum),
        vectors = if (detected.size > 1 || detected.exists(_._2.isMulti))
          detected.map(_._2) else Nil))
    }
  }

  private def decodeNearObject(jv: JValue): NearObject = {
    val id = str(jv, "id").getOrElse("")
    if (id.isEmpty) fail("near_object: id is required")
    val (dist, cert) = checkDistCert(jv, "near_object")
    val (tvs, _) = decodeTargets(jv)
    // numeric-string ids address numeric id columns (the engine's id columns
    // are typed; a real uuid string passes through unchanged)
    val idVal: Any = if (id.forall(_.isDigit)) id.toLong else id
    NearObject(idVal, metric = Metric.Default, distance = dist, certainty = cert, targetVectors = tvs)
  }

  private def decodeMove(jv: JValue, name: String): Option[MoveParams] =
    field(jv, name).map { m =>
      MoveParams(
        concepts = strArr(m, "concepts"),
        force = num(m, "force").getOrElse(0.0),
        objects = strArr(m, "uuids")
          .map(u => if (u.nonEmpty && u.forall(_.isDigit)) u.toLong else (u: Any)))
    }

  private def decodeNearText(jv: JValue): NearText = {
    val concepts = strArr(jv, "query")
    val (dist, cert) = checkDistCert(jv, "near_text")
    val (tvs, _) = decodeTargets(jv)
    NearText(concepts, metric = Metric.Default, distance = dist, certainty = cert,
      moveTo = decodeMove(jv, "moveTo"), moveAwayFrom = decodeMove(jv, "moveAway"),
      targetVectors = tvs, autocorrect = bool(jv, "autocorrect"))
  }

  private def decodeNearMedia(kind: MediaKind, payloadField: String, jv: JValue): NearMedia = {
    val payload = str(jv, payloadField).getOrElse(fail(s"near_${kind.name}: $payloadField is required"))
    val (dist, cert) = checkDistCert(jv, s"near_${kind.name}")
    val (tvs, _) = decodeTargets(jv)
    NearMedia(kind, Base64.getDecoder.decode(payload), metric = Metric.Default,
      distance = dist, certainty = cert, targetVectors = tvs)
  }

  private def decodeSearchOperator(jv: JValue, name: String): Option[SearchOperator] =
    field(jv, name).map { so =>
      val op = str(so, "operator").getOrElse("")
      val min = intF(so, "minimumOrTokensMatch").map(_.toInt).getOrElse(1)
      if (enumIs(op, "OPERATOR_", "and")) SearchOperator.AndOp
      else SearchOperator.Or(min)
    }

  private def decodeBm25(jv: JValue): Bm25 =
    Bm25(
      query = str(jv, "query").getOrElse(fail("bm25: query is required")),
      properties = strArr(jv, "properties"),
      searchOperator = decodeSearchOperator(jv, "searchOperator").getOrElse(SearchOperator.Or(1)))

  private def decodeHybrid(jv: JValue, isMulti: String => Boolean = _ => false): Hybrid = {
    val fusion = str(jv, "fusionType") match {
      case Some(f) if enumIs(f, "FUSION_TYPE_", "ranked") => FusionType.Ranked
      case Some(f) if enumIs(f, "FUSION_TYPE_", "relative_score") => FusionType.RelativeScore
      case _ => FusionType.RelativeScore // HybridFusionDefault (common_filters/hybrid.go:28)
    }
    val (tvs, combo) = decodeTargets(jv)
    val (vec, multi) = extractVectorArg(jv, "hybrid")
    if (multi.isDefined) fail("hybrid: multi vectors are not supported in the dense leg")
    // alpha resolution (parse_search_request.go:308-314): use_alpha_param
    // switches to the optional alpha_param (absent → DefaultAlpha 0.75);
    // legacy clients keep the deprecated `alpha` field, proto3-defaulted
    val alpha =
      if (bool(jv, "useAlphaParam")) num(jv, "alphaParam").getOrElse(0.75) // DefaultAlpha (common_filters/hybrid.go:23)
      else num(jv, "alpha").getOrElse(0.0) // raw proto3-defaulted hs.Alpha (parse_search_request.go:308-310)
    val vectorDistance = num(jv, "vectorDistance")

    // sub-searches: selection only at the top level (parse_search_request.go:295-300)
    field(jv, "nearText").foreach { nt =>
      if (field(nt, "selection").isDefined)
        fail("hybrid: selection must be set on the top-level hybrid search, not on the near_text sub-search")
    }
    field(jv, "nearVector").foreach { nv =>
      if (field(nv, "selection").isDefined)
        fail("hybrid: selection must be set on the top-level hybrid search, not on the near_vector sub-search")
    }
    val nearTxt = field(jv, "nearText").map(decodeNearText)
    // the hybrid's OWN Targets drive the near_vector parse (the reference
    // routes hs.NearVector through parseNearVec with hs.Targets,
    // parse_search_request.go:301-330)
    val nearVec = field(jv, "nearVector").map(nv =>
      decodeNearVector(nv, isMulti, Some((tvs, combo))).left.getOrElse(
        fail("hybrid: multi vectors are not supported in the near_vector sub-search")))

    if (nearTxt.isDefined && nearVec.isDefined)
      fail("cannot combine nearText and nearVector in hybrid search")
    if (nearTxt.isDefined && vec.isDefined)
      fail("cannot combine nearText and query in hybrid search")
    if (nearVec.isDefined && vec.isDefined)
      fail("cannot combine nearVector and vector in hybrid search")

    // the nearVector sub-search IS the dense leg: its vector becomes the
    // hybrid vector, its distance/certainty the dense-leg cutoff
    // (explorer_hybrid.go routes NearVectorParams into the dense search).
    // A multi-target/unrolled leg rides whole as denseParams.
    val multiDense = nearVec.filter(nv => nv.targetVectors.size > 1 || nv.vectors.nonEmpty)
    val denseCutoff = vectorDistance
      .orElse(nearVec.flatMap(_.distance))
      .orElse(nearVec.flatMap(_.certainty).map(c => 2.0 * (1.0 - c)))
    val denseVec = if (multiDense.isDefined) None else vec.orElse(nearVec.map(_.vector))

    Hybrid(
      query = str(jv, "query").getOrElse(""),
      vector = denseVec,
      metric = Metric.Default,
      alpha = alpha,
      fusionType = fusion,
      properties = strArr(jv, "properties"),
      maxVectorDistance = denseCutoff,
      targetVectors = if (tvs.nonEmpty) tvs else nearVec.map(_.targetVectors).getOrElse(Nil),
      searchOperator = decodeSearchOperator(jv, "bm25SearchOperator").getOrElse(SearchOperator.Or(1)),
      nearText = nearTxt,
      denseParams = multiDense.map(nv => nv.copy(distance = denseCutoff.orElse(nv.distance))))
  }

  private def decodeSelectionMmr(jv: JValue): Option[SelectionMmrParams] =
    field(jv, "selection").flatMap(sel => field(sel, "mmr")).map { mmr =>
      val limit = intF(mmr, "limit").map(_.toInt).getOrElse(0)
      // the reference checks == 0 (proto's unsigned wire type makes negatives
      // unrepresentable there); JSON can carry them, so gate the full range
      if (limit < 1) fail("MMR limit must be at least 1")
      val balance = num(mmr, "balance").getOrElse(0.5)
      if (balance < 0 || balance > 1) fail("MMR balance must be between 0 and 1")
      SelectionMmrParams(limit, balance)
    }

  // ==========================================================================
  // SearchRequest → GetParams
  // ==========================================================================

  def search(g: Graft, json: String): GetParams = decodeSearch(g, JsonMethods.parse(json))

  private[engine] def decodeSearch(g: Graft, jv: JValue): GetParams = {
    val collection = str(jv, "collection").getOrElse(fail("collection is required"))
    g.collection(collection) // authorizedGetClass: unknown collection errors first

    val tenant = str(jv, "tenant")
    val where = field(jv, "filters").map(decodeFilters(g, collection, _))

    // metadata → additional set (extractAdditionalPropsFromMetadata)
    val additional: Set[String] = field(jv, "metadata").map { m =>
      Seq(
        "uuid" -> "id", "vector" -> "vector", "distance" -> "distance",
        "certainty" -> "certainty", "score" -> "score", "explainScore" -> "explainScore",
        "creationTimeUnix" -> "creationTimeUnix", "lastUpdateTimeUnix" -> "lastUpdateTimeUnix"
      ).collect { case (f, key) if bool(m, f) => key }.toSet
    }.getOrElse(Set.empty)
    // named-vector metadata selection (MetadataRequest.vectors,
    // search_get.proto:87) — return only these spaces, name-tagged
    val additionalVectors: Seq[String] =
      field(jv, "metadata").map(m => strArr(m, "vectors")).getOrElse(Nil)

    // properties request (extractPropertiesRequest): absent → all non-ref
    // props (the engine's properties=Nil); nonRefProperties → exactly those;
    // refProperties → resolveRefs
    val (props, refs) = field(jv, "properties") match {
      case None => (Nil: Seq[String], Nil: Seq[String])
      case Some(p) =>
        // nested-object selections (ObjectPropertiesRequest) select the
        // whole declared struct; sub-field pruning is reply-side
        val objProps = arr(p, "objectProperties").getOrElse(Nil)
          .map(op => str(op, "propName").getOrElse(fail("objectProperties: propName is required")))
        // returnAllNonrefProperties already covers object props (the
        // reference appends them to an all-inclusive list,
        // parse_search_request.go:987-996,1096); here Nil = "all", so the
        // selection must stay empty rather than narrow to objProps only
        val nonRef =
          if (bool(p, "returnAllNonrefProperties")) Nil
          else strArr(p, "nonRefProperties") ++ objProps
        val refProps = arr(p, "refProperties").getOrElse(Nil)
          .map(rp => str(rp, "referenceProperty").getOrElse(fail("refProperties: referenceProperty is required")))
        (nonRef, refProps)
    }

    val offset = intF(jv, "offset").map(_.toInt).getOrElse(0)
    val autocut = intF(jv, "autocut").map(_.toInt).filter(_ > 0)
    // limit 0 → QueryDefaults.Limit (config_handler.go:887 = 10)
    val limit = intF(jv, "limit").map(_.toInt).filter(_ > 0).getOrElse(10)
    val pagination = Pagination(offset = offset, limit = limit)

    val bm25 = field(jv, "bm25Search").map(decodeBm25)
    val isMulti: String => Boolean = g.collection(collection).isMultiVector
    val nearVecLeg = field(jv, "nearVector").map(decodeNearVector(_, isMulti))
    val nearObject = field(jv, "nearObject").map(decodeNearObject)
    val nearText = field(jv, "nearText").map(decodeNearText)
    val hybrid = field(jv, "hybridSearch").map(decodeHybrid(_, isMulti))
    val nearMedia =
      field(jv, "nearImage").map(decodeNearMedia(MediaKind.Image, "image", _))
        .orElse(field(jv, "nearAudio").map(decodeNearMedia(MediaKind.Audio, "audio", _)))
        .orElse(field(jv, "nearVideo").map(decodeNearMedia(MediaKind.Video, "video", _)))
        .orElse(field(jv, "nearDepth").map(decodeNearMedia(MediaKind.Depth, "depth", _)))
        .orElse(field(jv, "nearThermal").map(decodeNearMedia(MediaKind.Thermal, "thermal", _)))
        .orElse(field(jv, "nearImu").map(decodeNearMedia(MediaKind.Imu, "imu", _)))

    // selection (MMR) may sit on nearVector / nearObject / nearText / hybrid
    val selection =
      field(jv, "nearVector").flatMap(decodeSelectionMmr)
        .orElse(field(jv, "nearObject").flatMap(decodeSelectionMmr))
        .orElse(field(jv, "nearText").flatMap(decodeSelectionMmr))
        .orElse(field(jv, "hybridSearch").flatMap(decodeSelectionMmr))
    selection.foreach { mmr =>
      if (limit > 0 && mmr.limit > limit)
        fail(s"MMR limit (${mmr.limit}) cannot be larger than the query limit ($limit)")
    }

    val hasSearch = bm25.isDefined || nearVecLeg.isDefined || nearObject.isDefined ||
      nearText.isDefined || hybrid.isDefined || nearMedia.isDefined ||
      field(jv, "generative").isDefined

    val sort = arr(jv, "sortBy").getOrElse(Nil).map { s =>
      SortBy(strArr(s, "path"), desc = !bool(s, "ascending"))
    }
    if (sort.nonEmpty && hasSearch) fail("sorting cannot be combined with search")

    val groupBy = field(jv, "groupBy").map { gb =>
      val path = strArr(gb, "path")
      if (path.size != 1)
        fail(s"groupby path can only have one entry, received ${goStrSlice(path)}")
      GroupByParams(path.head,
        groups = intF(gb, "numberOfGroups").map(_.toInt).getOrElse(0),
        objectsPerGroup = intF(gb, "objectsPerGroup").map(_.toInt).getOrElse(0))
    }

    val cursor = str(jv, "after").filter(_.nonEmpty).map { after =>
      val key: Any = if (after.nonEmpty && after.forall(_.isDigit)) after.toLong else after
      Cursor(Some(key), limit)
    }

    val rerank = field(jv, "rerank").map { r =>
      RerankParams(
        property = str(r, "property").getOrElse(fail("rerank: property is required")),
        query = str(r, "query").getOrElse(""))
    }

    // Boost (search_get.proto:218-263 — SearchRequest.boost field 62):
    // condition oneofs with per-condition weights; enum curves/modifiers
    // decode to their short names
    val boost = field(jv, "boost").map { b =>
      def curveOf(o: JValue): String = str(o, "curve").map {
        case "DECAY_CURVE_GAUSS" => "gauss"
        case "DECAY_CURVE_LINEAR" => "linear"
        case "DECAY_CURVE_EXPONENTIAL" => "exp"
        case "DECAY_CURVE_UNSPECIFIED" => ""
        case other => other
      }.getOrElse("")
      val conds = arr(b, "conditions").getOrElse(Nil).map { cd =>
        val weight = num(cd, "weight").getOrElse(1.0)
        field(cd, "filter")
          .map(f => BoostCondition(
            filter = Some(decodeFilters(g, collection, f)), weight = weight))
          .orElse(field(cd, "timeDecay").map(td => BoostCondition(
            timeDecay = Some(TimeDecayParams(
              str(td, "property").getOrElse(fail("time_decay: property is required")),
              str(td, "origin").getOrElse(""), str(td, "scale").getOrElse(""),
              str(td, "offset").getOrElse(""), curveOf(td),
              num(td, "decayValue").getOrElse(0))), weight = weight)))
          .orElse(field(cd, "numericDecay").map(nd => BoostCondition(
            numericDecay = Some(NumericDecayParams(
              str(nd, "property").getOrElse(fail("numeric_decay: property is required")),
              num(nd, "origin").getOrElse(0), num(nd, "scale").getOrElse(0),
              num(nd, "offset").getOrElse(0), curveOf(nd),
              num(nd, "decayValue").getOrElse(0))), weight = weight)))
          .orElse(field(cd, "propertyValue").map(pv => BoostCondition(
            propertyValue = Some(PropertyValueParams(
              str(pv, "property").getOrElse(fail("property_value: property is required")),
              str(pv, "modifier").map {
                case "PROPERTY_VALUE_MODIFIER_LOG1P" => "log1p"
                case "PROPERTY_VALUE_MODIFIER_SQRT" => "sqrt"
                case "PROPERTY_VALUE_MODIFIER_UNSPECIFIED" => ""
                case other => other
              }.getOrElse(""))), weight = weight)))
          .getOrElse(fail(
            "boost condition must set one of filter | time_decay | property_value | numeric_decay"))
      }
      BoostParams(conds, num(b, "weight").getOrElse(0.0), intF(b, "depth").map(_.toInt))
    }

    // GenerativeSearch (generative.proto): single{prompt} grouped{task, properties}
    val generate = field(jv, "generative").map { gen =>
      val single = field(gen, "single").flatMap(s => str(s, "prompt"))
        .orElse(str(gen, "singleResponsePrompt"))
      val grouped = field(gen, "grouped")
      GenerateParams(
        singlePrompt = single,
        groupedTask = grouped.flatMap(t => str(t, "task")).orElse(str(gen, "groupedResponseTask")),
        groupedProperties = grouped.map(t => strArr(t, "properties")).getOrElse(strArr(gen, "groupedProperties")))
    }

    GetParams(
      collection = collection,
      where = where,
      nearVector = nearVecLeg.flatMap(_.left.toOption),
      nearMultiVector = nearVecLeg.flatMap(_.toOption),
      nearObject = nearObject,
      nearText = nearText,
      nearMedia = nearMedia,
      bm25 = bm25,
      hybrid = hybrid,
      sort = sort,
      pagination = Some(pagination),
      cursor = cursor,
      groupBy = groupBy,
      properties = props,
      additional = additional,
      additionalVectors = additionalVectors,
      resolveRefs = refs,
      tenant = tenant,
      autocut = autocut,
      rerank = rerank,
      boost = boost,
      generate = generate,
      selectionMmr = selection)
  }

  // ==========================================================================
  // AggregateRequest → AggregateParams (parse_aggregate_request.go)
  // ==========================================================================

  def aggregate(g: Graft, json: String): AggregateParams = decodeAggregate(g, JsonMethods.parse(json))

  private[engine] def decodeAggregate(g: Graft, jv: JValue): AggregateParams = {
    val collection = str(jv, "collection").getOrElse(fail("collection is required"))
    g.collection(collection)

    val groupBy = field(jv, "groupBy").map { gb =>
      Seq(str(gb, "property").getOrElse(fail("groupBy: property is required")))
    }

    val aggregations: Map[String, Seq[Aggregator]] =
      arr(jv, "aggregations").getOrElse(Nil).map { agg =>
        val prop = str(agg, "property").getOrElse(fail("aggregations: property is required"))
        prop -> decodeAggregators(agg)
      }.toMap

    val where = field(jv, "filters").map(decodeFilters(g, collection, _))

    // single search oneof; >1 target vector errors (parse_aggregate_request.go:100-102)
    def checkSingleTarget(legJv: JValue): Unit = {
      val (tvs, _) = decodeTargets(legJv)
      if (tvs.size > 1) fail("found more than one target vector for aggregation")
    }
    val isMulti: String => Boolean = g.collection(collection).isMultiVector
    val nearVec = field(jv, "nearVector").map { nv => checkSingleTarget(nv); decodeNearVector(nv, isMulti) }
    // AggregateParams has no multi-vector leg: a MULTI_FP32 payload must
    // error loudly, not silently aggregate the whole collection unrestricted
    nearVec.foreach(v => if (v.isRight)
      fail("near_vector: multi vector is not supported for aggregation"))
    val nearObject = field(jv, "nearObject").map { no => checkSingleTarget(no); decodeNearObject(no) }
    val nearText = field(jv, "nearText").map { nt => checkSingleTarget(nt); decodeNearText(nt) }
    val hybrid = field(jv, "hybrid").map { h => checkSingleTarget(h); decodeHybrid(h, isMulti) }
    val nearMedia = field(jv, "nearImage").map(decodeNearMedia(MediaKind.Image, "image", _))

    AggregateParams(
      collection = collection,
      groupBy = groupBy,
      properties = aggregations,
      includeMetaCount = bool(jv, "objectsCount"),
      where = where,
      nearVector = nearVec.flatMap(_.left.toOption),
      nearObject = nearObject,
      nearText = nearText,
      nearMedia = nearMedia,
      hybrid = hybrid,
      objectLimit = intF(jv, "objectLimit").map(_.toInt),
      limit = intF(jv, "limit").map(_.toInt),
      tenant = str(jv, "tenant"))
  }

  /** Per-type aggregator flag messages (parse_aggregate_request.go:354-481).
   * The oneof arm is keyed "int"/"number"/"text"/"boolean"/"date"/"reference". */
  private def decodeAggregators(agg: JValue): Seq[Aggregator] = {
    import Aggregator._
    def flags(o: JValue, pairs: (String, Aggregator)*): Seq[Aggregator] =
      pairs.collect { case (f, a) if bool(o, f) => a }
    field(agg, "int").orElse(field(agg, "number")).map { o =>
      flags(o, "count" -> Count, "type" -> Type, "mean" -> Mean, "median" -> Median,
        "mode" -> Mode, "maximum" -> Maximum, "minimum" -> Minimum, "sum" -> Sum)
    }.orElse(field(agg, "text").map { o =>
      val base = flags(o, "count" -> Count, "type" -> Type)
      // parse quirk (parse_aggregate_request.go:418-425): topOccurences
      // WITHOUT a limit parses as TotalTrueAggregator — but the TEXT
      // execution path never reads that member; it always runs
      // topOccurrences with the list's limit or the default 5
      // (aggregator/text.go:24-33 extractLimitFromTopOccs). The OBSERVABLE
      // contract — what grpc_mixed_vectors_test.go and
      // grpc_aggregate_test.go read back — is TopOccurrences(5).
      val top = if (bool(o, "topOccurences"))
        Seq(TopOccurrences(intF(o, "topOccurencesLimit").map(_.toInt).getOrElse(5)))
      else Nil
      base ++ top
    }).orElse(field(agg, "boolean").map { o =>
      flags(o, "count" -> Count, "type" -> Type, "totalTrue" -> TotalTrue,
        "totalFalse" -> TotalFalse, "percentageTrue" -> PercentageTrue,
        "percentageFalse" -> PercentageFalse)
    }).orElse(field(agg, "date").map { o =>
      flags(o, "count" -> Count, "type" -> Type, "median" -> Median, "mode" -> Mode,
        "maximum" -> Maximum, "minimum" -> Minimum)
    }).orElse(field(agg, "reference").map { o =>
      flags(o, "type" -> Type, "pointingTo" -> PointingTo)
    }).getOrElse(Nil)
  }

  // ==========================================================================
  // Single-object REST CRUD — the models.Object wire shape
  // (POST /v1/objects, PUT/PATCH /v1/objects/{class}/{id};
  // usecases/objects/{add,update,merge}.go + validation/
  // properties_validation.go). Unlike the gRPC batch shape, properties
  // arrive as ONE flat JSON map typed by the class schema.
  // ==========================================================================

  /** A decoded models.Object. `id` is LOWERCASED when provided (the
   * reference normalizes on write, gh-2647 — checkIDOrAssignNew,
   * add.go:145-162); `rawId` keeps the submitted casing because the
   * duplicate-id error quotes it verbatim. */
  final case class RestObject(
      collection: String,
      id: Option[String],
      rawId: Option[String],
      tenant: Option[String],
      properties: Map[String, JValue],
      vectors: Map[String, Array[Float]])

  def decodeRestObject(json: String): RestObject = {
    val jv = JsonMethods.parse(json)
    val coll = str(jv, "class").getOrElse("")
    val rawId = str(jv, "id").filter(_.nonEmpty)
    rawId.foreach(validateUuid)
    val props: Map[String, JValue] = field(jv, "properties") match {
      case Some(JObject(kvs)) => kvs.toMap
      case None | Some(JNull) => Map.empty
      case Some(o) => fail(s"properties: expected an object, got ${JsonMethods.compact(JsonMethods.render(o))}")
    }
    val legacy: Map[String, Array[Float]] = arr(jv, "vector") match {
      case Some(xs) if xs.nonEmpty => Map("" -> floatArr("vector", xs))
      case _ => Map.empty
    }
    val named: Map[String, Array[Float]] = field(jv, "vectors") match {
      case Some(JObject(kvs)) => kvs.map {
        case (n, JArray(xs)) => n -> floatArr(s"vectors.$n", xs)
        case (n, o) => fail(s"vectors.$n: expected a float list, got ${JsonMethods.compact(JsonMethods.render(o))}")
      }.toMap
      case _ => Map.empty
    }
    RestObject(coll, rawId.map(_.toLowerCase), rawId,
      str(jv, "tenant").filter(_.nonEmpty), props, legacy ++ named)
  }

  /** Type the flat properties map against the class schema with the
   * reference's validation texts (validateObjectAndNormalizeNames wraps
   * every violation as "invalid object: ...", add.go:117-119; inner texts
   * properties_validation.go:176-318,394-445,419,430). Returns engine
   * column values: scalars, text[], phone structs as [[graft.model.Phone.Parsed]],
   * geo as (lat, lon), cref beacon lists as target-id seqs. */
  def restObjectValues(schema: graft.model.CollectionSchema,
                       o: RestObject): Map[String, Any] = {
    import graft.model._
    def inv(msg: String): Nothing = fail(s"invalid object: $msg")
    // the REST object handler decodes with json.Decoder.UseNumber(), so
    // Go's %T renders numerics as json.Number on this path (unlike the
    // GraphQL layer's plain float64)
    def goT(j: JValue): String = j match {
      case JInt(_) | JLong(_) | JDouble(_) | JDecimal(_) => "json.Number"
      case other => goJsonType(other)
    }
    o.properties.map { case (name0, v) =>
      // LowercaseAllPropertyNames normalization, like the schema wire
      val name = if (name0.isEmpty) name0 else name0.head.toLower + name0.tail
      val p = schema.property(name).getOrElse(inv(s"unknown property '$name'"))
      def wrap(kind: String, inner: String): Nothing =
        inv(s"invalid $kind property '$name' on class '${schema.name}': $inner")
      def dateOf(s0: String, kind: String): java.sql.Timestamp =
        try java.sql.Timestamp.from(java.time.OffsetDateTime.parse(s0).toInstant)
        catch { case _: Exception =>
          wrap(kind, s"requires a string with a RFC3339 formatted date, but the given value is '$s0'") }
      val value: Any = (p.dataType, v) match {
        case (PropType.Text, JString(x)) => x
        case (PropType.Text, other) => wrap("text", s"not a string, but ${goT(other)}")
        case (PropType.Int, JInt(x)) => x.toLong
        case (PropType.Int, JLong(x)) => x
        case (PropType.Int, JDouble(x)) =>
          if (x == math.floor(x) && !x.isInfinite) x.toLong
          else wrap("integer", s"the JSON number '${goFloat(x)}' could not be converted to an int")
        case (PropType.Int, other) =>
          wrap("integer", s"requires an integer, the given value is '${JsonMethods.compact(JsonMethods.render(other))}'")
        case (PropType.Number, JDouble(x)) => x
        case (PropType.Number, JInt(x)) => x.toDouble
        case (PropType.Number, JLong(x)) => x.toDouble
        case (PropType.Number, other) =>
          wrap("number", s"requires a float, the given value is '${JsonMethods.compact(JsonMethods.render(other))}'")
        case (PropType.Bool, JBool(x)) => x
        case (PropType.Bool, other) => wrap("boolean", s"not a bool, but ${goT(other)}")
        case (PropType.Date, JString(x)) => dateOf(x, "date")
        case (PropType.Date, other) =>
          wrap("date", s"requires a string with a RFC3339 formatted date, but the given value is '${JsonMethods.compact(JsonMethods.render(other))}'")
        case (PropType.Uuid, JString(x)) =>
          try { validateUuid(x); x.toLowerCase }
          catch { case _: Exception =>
            wrap("uuid", s"requires a string of UUID format, but the given value is '$x'") }
        case (PropType.Uuid, other) =>
          wrap("uuid", s"requires a string of UUID format, but the given value is '${JsonMethods.compact(JsonMethods.render(other))}'")
        case (PropType.Geo, g: JObject) =>
          val lat = num(g, "latitude").getOrElse(
            wrap("geoCoordinates", "latitude must be set"))
          val lon = num(g, "longitude").getOrElse(
            wrap("geoCoordinates", "longitude must be set"))
          (lat, lon)
        case (PropType.Phone, ph: JObject) =>
          val input = str(ph, "input").getOrElse(
            wrap("phoneNumber", "phoneNumber is a map, but 'input' is missing"))
          Phone.parse(input, str(ph, "defaultCountry").getOrElse(""))
        case (PropType.Ref, JArray(beacons)) =>
          beacons.map { b =>
            val beacon = str(b, "beacon").getOrElse(inv(
              s"invalid cref: only direct references supported at the moment, " +
              s"concept references not supported yet: class '${schema.name}' with property '$name'" +
              " requires exactly 1 arguments: 'beacon'. Check your input schema"))
            val seg = beacon.split('/').filter(_.nonEmpty)
            if (seg.isEmpty) inv(s"invalid cref: invalid beacon '$beacon'")
            // multi-class cref edges must keep the class segment (when the
            // beacon carries one) — resolution dispatches per class; single-
            // class columns store the bare target id as before
            if (p.isMultiRef && seg.length >= 2 && seg(seg.length - 2).headOption.exists(_.isUpper))
              seg(seg.length - 2) + "/" + seg.last
            else seg.last
          }
        case (PropType.Arr(PropType.Text), JArray(xs)) =>
          xs.map {
            case JString(x) => x
            case other => wrap("text array", s"not a text array, but ${goT(other)}")
          }
        case (PropType.Arr(PropType.Int), JArray(xs)) =>
          xs.map {
            case JInt(x) => x.toLong
            case JLong(x) => x
            case JDouble(x) if x == math.floor(x) => x.toLong
            case other => wrap("integer array", s"not an integer array, but ${goT(other)}")
          }
        case (PropType.Arr(PropType.Number), JArray(xs)) =>
          xs.map {
            case JDouble(x) => x
            case JInt(x) => x.toDouble
            case JLong(x) => x.toDouble
            case other => wrap("number array", s"not a number array, but ${goT(other)}")
          }
        case (_: PropType.Arr, other) =>
          wrap(p.dataType.name.dropRight(2) + " array", s"not a ${p.dataType.name.dropRight(2)} array, but ${goT(other)}")
        case (dt, other) =>
          wrap(dt.name, s"unsupported value ${JsonMethods.compact(JsonMethods.render(other))}")
      }
      name -> value
    }
  }

  /** PATCH input sanity (merge.go:207-218 validateInputs). */
  def validatePatchInputs(cls: String, id: String): Unit = {
    if (cls.isEmpty) fail("empty class")
    if (id.isEmpty) fail("empty uuid")
  }
}
