package graft.engine

import org.apache.spark.sql.{DataFrame, Row}

import graft.model._

/**
 * Reply-side wire encoder — renders a served result page as the gRPC
 * `SearchReply` JSON shape (protojson naming), closing the wire loop:
 * a decoded `SearchRequest` drives the engine and the page encodes back
 * into the reply a reference client would parse.
 *
 * Reference: adapters/handlers/grpc/v1/prepare_reply.go —
 * Search:78-113 (results + took), extractAdditionalProps:204-412 (the
 * proto3 explicit-presence contract: each requested metadata field carries
 * a paired `*Present` boolean, false when the engine served no value, with
 * the proto default in the value slot), buildPropertiesResult:546-600
 * (requested non-ref properties only), extractGroup:413-521 (group pages
 * render as groupByResults with per-group min/max distance and hits).
 *
 * Scope notes vs the reference, documented divergences:
 *  - `idAsBytes` is emitted only for uuid-shaped ids (the reference's
 *    idToByte errors on anything else; this engine also serves numeric id
 *    columns, which encode as strings alone).
 *  - explainScore's payload is engine-shaped (per-term `_exp_*` columns
 *    folded into one string) — the reference's explain text is its own
 *    internal format, only the presence contract is shared.
 */
object WireEncoder {

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def num(v: Any): String = v match {
    case f: Float => WireDecoder.goFloat(f.toDouble)
    case d: Double => WireDecoder.goFloat(d)
    case n: Number => n.toString
    case other => other.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => esc(s)
    case b: Boolean => b.toString
    case f: Float => num(f)
    case d: Double => num(d)
    case n: Number => n.toString
    case ts: java.sql.Timestamp => esc(ts.toInstant.toString)
    // blob properties serialize as base64 like the REST object shape
    case bytes: Array[Byte] => esc(java.util.Base64.getEncoder.encodeToString(bytes))
    case arr: Array[_] => arr.map(jsonValue).mkString("[", ",", "]")
    case seq: scala.collection.Seq[_] => seq.map(jsonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.sortBy(_._1.toString)
        .map { case (k, x) => s"${esc(k.toString)}:${jsonValue(x)}" }
        .mkString("{", ",", "}")
    case r: Row => r.schema.fieldNames.zipWithIndex
      .map { case (f, i) => s"${esc(f)}:${jsonValue(r.get(i))}" }
      .mkString("{", ",", "}")
    case other => esc(other.toString)
  }

  private def UuidShaped = WireDecoder.UuidRe

  /** LE fp32 packing (byteops.Fp32SliceToBytes), base64 for the wire. */
  private def b64Fp32(vs: Seq[Any]): String = {
    val bb = java.nio.ByteBuffer.allocate(vs.size * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => bb.putFloat(v.asInstanceOf[Number].floatValue))
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  /** Multi-vector packing (byteops.Fp32SliceOfSlicesToBytes): a uint16 LE
   * per-row dimension header, then the rows as LE fp32. */
  private def b64Multi(rows: Seq[scala.collection.Seq[Any]]): String = {
    val dim = rows.headOption.map(_.size).getOrElse(0)
    val bb = java.nio.ByteBuffer.allocate(2 + rows.size * dim * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(dim.toShort)
    rows.foreach(_.foreach(v => bb.putFloat(v.asInstanceOf[Number].floatValue)))
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  /** REST object ref-prop rendering with to-class detection (rest handlers
   * render MultipleRef as beacon+href pairs; a SHORT stored edge on a
   * SINGLE-target property reads back qualified with the declared target
   * class, while multi-target properties render the stored form verbatim —
   * objects/crefs_test.go TestRefsWithoutToClass / TestRefsMultiTarget).
   * Stored edges are `uuid` or `Class/uuid`; returns (beacon, href) pairs. */
  def refBeacons(prop: graft.model.Property, edges: Seq[String]): Seq[(String, String)] =
    edges.map { e =>
      val path =
        if (e.contains('/')) e
        else prop.refTarget match {
          case Some(cls) if prop.refTargets.isEmpty => s"$cls/$e"
          case _ => e // multi-target: no detection, verbatim
        }
      (s"weaviate://localhost/$path", s"/v1/objects/$path")
    }

  /** One result's `{properties, metadata}` object. */
  private def encodeResult(row: Row, cols: Map[String, Int],
                           params: GetParams): String = {
    // an absent properties request returns ALL declared props
    // (extractPropertiesRequest → getAllNonRefNonBlobProperties): the page
    // was projected to exactly those, so take every non-internal column
    val groupColNames = Set("group_value", "group_index",
      "group_hit_rank", "group_min_distance", "group_max_distance")
    val propNames =
      if (params.properties.nonEmpty) params.properties
      else cols.keys.filterNot(c => c.startsWith("_") || groupColNames(c)).toSeq.sorted
    val props = propNames.flatMap { p =>
      cols.get(p).map(i => s"${esc(p)}:${jsonValue(row.get(i))}")
    }.mkString("{", ",", "}")

    val md = Seq.newBuilder[String]
    if (params.additional.contains("id")) cols.get("_id").foreach { i =>
      val id = String.valueOf(row.get(i))
      md += s""""id":${esc(id)}"""
      if (UuidShaped.matches(id)) {
        val u = java.util.UUID.fromString(id)
        val bb = java.nio.ByteBuffer.allocate(16)
        bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
        md += s""""idAsBytes":${esc(java.util.Base64.getEncoder.encodeToString(bb.array()))}"""
      }
    }
    // the proto3 explicit-presence pairs: requested ⇒ both fields emitted,
    // value defaulted when the engine served none (extractAdditionalProps)
    def presencePair(requested: Boolean, colName: String, field: String,
                     default: String = "0"): Unit = if (requested) {
      val served = cols.get(colName).filter(i => !row.isNullAt(i))
      md += s"""${esc(field)}:${served.map(i => num(row.get(i))).getOrElse(default)}"""
      md += s"""${esc(field + "Present")}:${served.isDefined}"""
    }
    presencePair(params.additional.contains("distance"), "_distance", "distance")
    presencePair(params.additional.contains("certainty"), "_certainty", "certainty")
    presencePair(params.additional.contains("score"), "_score", "score")
    presencePair(params.additional.contains("creationTimeUnix"),
      "_creationTimeUnix", "creationTimeUnix")
    presencePair(params.additional.contains("lastUpdateTimeUnix"),
      "_lastUpdateTimeUnix", "lastUpdateTimeUnix")
    if (params.additional.contains("explainScore")) {
      // hybrid pages carry the fusion's ready-made explanation string;
      // BM25 pages fold their per-term `_exp_*` contribution columns
      val hybridExp = cols.get(graft.operators.HybridSearch.ExplainCol)
        .filter(i => !row.isNullAt(i)).map(i => String.valueOf(row.get(i)))
      val exp = hybridExp.getOrElse(
        cols.keys.filter(_.startsWith("_exp_")).toSeq.sorted
          .flatMap(c => cols.get(c).filter(i => !row.isNullAt(i))
            .map(i => s"${c.stripPrefix("_exp_")}:${num(row.get(i))}"))
          .mkString(", "))
      md += s""""explainScore":${esc(exp)}"""
      md += s""""explainScorePresent":${exp.nonEmpty}"""
    }
    // vector metadata (prepare_reply extractAdditionalProps): the legacy/
    // default space rides vectorBytes; named spaces ride MetadataResult
    // .vectors entries tagged with their names and payload types
    if (params.additional.contains("vector")) cols.get("_vector")
      .filter(i => !row.isNullAt(i)).foreach { i =>
        md += s""""vectorBytes":${esc(b64Fp32(row.getSeq[Any](i)))}"""
      }
    if (params.additional.contains("vector") || params.additionalVectors.nonEmpty) {
      val entries = cols.keys.filter(_.startsWith("_vectors_")).toSeq.sorted.flatMap { cn =>
        cols.get(cn).filter(i => !row.isNullAt(i)).map { i =>
          val name = cn.stripPrefix("_vectors_")
          row.get(i) match {
            case rows: scala.collection.Seq[_]
                if rows.nonEmpty && rows.head.isInstanceOf[scala.collection.Seq[_]] =>
              s"""{"name":${esc(name)},"vectorBytes":${esc(b64Multi(
                rows.map(_.asInstanceOf[scala.collection.Seq[Any]]).toSeq))},"type":"VECTOR_TYPE_MULTI_FP32"}"""
            case vs: scala.collection.Seq[_] =>
              s"""{"name":${esc(name)},"vectorBytes":${esc(b64Fp32(vs.toSeq))},"type":"VECTOR_TYPE_SINGLE_FP32"}"""
            case other =>
              s"""{"name":${esc(name)},"vectorBytes":${esc(String.valueOf(other))}}"""
          }
        }
      }
      if (entries.nonEmpty) md += s""""vectors":${entries.mkString("[", ",", "]")}"""
    }
    s"""{"properties":{"nonRefProperties":$props},"metadata":{${md.result().mkString(",")}}}"""
  }

  /** AggregateReply JSON (prepare_aggregate_reply.go): a non-grouped result
   * renders as `singleResult`, a grouped one as `groupedResults.groups[]`
   * with per-group `groupedBy {path, <typed value>}`. Each property's
   * payload is keyed by its SCHEMA type — int props render long-valued
   * mode/min/max/sum with double mean/median (parseIntegerAggregation),
   * number props all-double, text carries the proto's misspelled
   * `topOccurences` items, boolean the four tallies, reference pointingTo.
   * Only requested aggregators appear (proto optionals). */
  def aggregateReply(df: DataFrame, params: AggregateParams,
                     schema: CollectionSchema): String = {
    val rows = df.collect() // aggregate outputs are group-bounded
    val cols = df.columns.zipWithIndex.toMap

    def colVal(row: Row, name: String): Option[Any] =
      cols.get(name).filter(i => !row.isNullAt(i)).map(i => row.get(i))

    // protojson renders int64 as a QUOTED string — every long-typed field
    // (count, tallies, int-payload extrema) carries quotes like objectsCount
    def longV(v: Any): String = v match {
      case n: Number => "\"" + n.longValue.toString + "\""
      case o => esc(o.toString)
    }

    def aggregations(row: Row): String = {
      val aggs = params.properties.toSeq.sortBy(_._1).map { case (prop, requested) =>
        val names = requested.map(_.name).toSet
        def field(agg: String, render: Any => String): Option[String] =
          if (!names.contains(agg)) None
          else colVal(row, s"${prop}_$agg").map(v => s"${esc(agg)}:${render(v)}")
        def typeField: Option[String] =
          if (!names.contains("type")) None
          else colVal(row, s"${prop}_type").map(v => s""""type":${esc(v.toString)}""")
        val dt = schema.property(prop).map(_.dataType)
        val (kind, body) = dt match {
          case Some(PropType.Int) | Some(PropType.Arr(PropType.Int)) =>
            ("int", Seq(
              field("count", longV), typeField,
              field("mean", num), field("median", num),
              field("mode", longV), field("maximum", longV),
              field("minimum", longV), field("sum", longV)).flatten)
          case Some(PropType.Number) | Some(PropType.Arr(PropType.Number)) =>
            ("number", Seq(
              field("count", longV), typeField,
              field("mean", num), field("median", num), field("mode", num),
              field("maximum", num), field("minimum", num), field("sum", num)).flatten)
          case Some(PropType.Bool) | Some(PropType.Arr(PropType.Bool)) =>
            ("boolean", Seq(
              field("count", longV), typeField,
              field("totalTrue", longV), field("totalFalse", longV),
              field("percentageTrue", num), field("percentageFalse", num)).flatten)
          case Some(PropType.Date) | Some(PropType.Arr(PropType.Date)) =>
            ("date", Seq(
              field("count", longV), typeField,
              field("median", v => jsonValue(v)), field("mode", v => jsonValue(v)),
              field("maximum", v => jsonValue(v)), field("minimum", v => jsonValue(v))).flatten)
          case Some(PropType.Ref) =>
            ("reference", Seq(typeField,
              colVal(row, s"${prop}_pointingTo").map(v =>
                s""""pointingTo":${jsonValue(Seq(v.toString))}""")).flatten)
          case _ =>
            // text/text[] (and any remaining type): the text payload
            val top = colVal(row, s"${prop}_topOccurrences").map { arr =>
              val items = arr.asInstanceOf[scala.collection.Seq[Row]].map { t =>
                s"""{"value":${esc(String.valueOf(t.getAs[Any]("value")))},""" +
                  s""""occurs":${longV(t.getAs[Any]("occurs"))}}"""
              }
              s""""topOccurences":{"items":${items.mkString("[", ",", "]")}}"""
            }
            val topRequested = requested.exists {
              case Aggregator.TopOccurrences(_) => true; case _ => false
            }
            ("text", Seq(field("count", longV), typeField).flatten
              ++ (if (topRequested) top else None))
        }
        s"""{"property":${esc(prop)},${esc(kind)}:{${body.mkString(",")}}}"""
      }
      s"""{"aggregations":${aggs.mkString("[", ",", "]")}}"""
    }

    def groupJson(row: Row): String = {
      val count = colVal(row, "meta_count").map(v => s""""objectsCount":${longV(v)},""").getOrElse("")
      val groupedBy = params.groupBy.map { path =>
        val v = colVal(row, "groupedBy_value").orNull
        val typed = v match {
          case null => """"text":"""""
          case b: Boolean => s""""boolean":$b"""
          case n: java.lang.Long => s""""int":"$n""""
          case n: java.lang.Integer => s""""int":"$n""""
          case d: java.lang.Double => s""""number":${num(d)}"""
          case other => s""""text":${esc(other.toString)}"""
        }
        s""""groupedBy":{"path":${jsonValue(path)},$typed},"""
      }.getOrElse("")
      s"""{$count$groupedBy"aggregations":${aggregations(row)}}"""
    }

    if (params.groupBy.isDefined) {
      // the reference's pinned group order (aggregator/grouped.go): object
      // count DESC, then group value ASC — NOT a lexicographic re-sort, which
      // would scramble numeric group values and drop the count contract
      val ordered = rows.sortBy { r =>
        val cnt = colVal(r, "meta_count").map(v => v.asInstanceOf[Number].longValue).getOrElse(0L)
        (-cnt, String.valueOf(colVal(r, "groupedBy_value").orNull))
      }
      val groups = ordered.map(groupJson).mkString("[", ",", "]")
      s"""{"groupedResults":{"groups":$groups}}"""
    } else {
      rows.headOption match {
        case Some(row) => s"""{"singleResult":${groupJson(row)}}"""
        case None => "{}"
      }
    }
  }

  /** BatchDeleteReply JSON (batch_delete.go batchDeleteReplyFromObjects:
   * 71-117): matches + successful/failed tallies; `objects` only in verbose
   * mode, each with the uuid's 16 raw bytes (uuid.MarshalBinary) base64'd —
   * non-uuid ids encode as plain strings, the engine's numeric-id
   * divergence. The engine's filter-delete is all-or-nothing, so failed=0
   * and every listed object is successful. */
  def batchDeleteReply(matches: Long, deletedIds: Seq[String],
                       verbose: Boolean, dryRun: Boolean = false): String = {
    // the tally comes from `matches`, NOT deletedIds.size — a non-verbose
    // caller has no reason to collect ids (the list only feeds the verbose
    // objects array) and must still report the true success count. A DRY RUN
    // reports matches with ZERO successful/failed (batch_delete_test.go's
    // dry-run arms: Matches=N, Successful=0, Failed=0, objects error-free).
    val objs = if (!verbose) "" else {
      val items = deletedIds.map { id =>
        val uuidJson =
          if (UuidShaped.matches(id)) {
            val u = java.util.UUID.fromString(id)
            val bb = java.nio.ByteBuffer.allocate(16)
            bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
            esc(java.util.Base64.getEncoder.encodeToString(bb.array()))
          } else esc(id)
        s"""{"uuid":$uuidJson,"successful":${!dryRun},"error":""}"""
      }
      s""","objects":${items.mkString("[", ",", "]")}"""
    }
    val ok = if (dryRun) 0L else matches
    s"""{"matches":"$matches","successful":"$ok","failed":"0"$objs}"""
  }

  /** Encode a served page. Group pages (rows carrying the engine's group_*
   * columns) render as `groupByResults`; flat pages as `results`. */
  def searchReply(page: DataFrame, params: GetParams, took: Double): String = {
    val rows = page.collect() // result pages are pagination-bounded
    val cols = page.columns.zipWithIndex.toMap
    val tookJson = s""""took":${WireDecoder.goFloat(took)}"""
    if (cols.contains("group_value")) {
      val groups = rows.groupBy(r => r.get(cols("group_index")).toString.toLong)
        .toSeq.sortBy(_._1)
        .map { case (_, hits) =>
          val sortedHits = hits.sortBy(r => r.get(cols("group_hit_rank")).toString.toLong)
          val head = sortedHits.head
          def d(c: String): String =
            cols.get(c).filter(i => !head.isNullAt(i)).map(i => num(head.get(i))).getOrElse("0")
          s"""{"name":${esc(String.valueOf(head.get(cols("group_value"))))},""" +
            s""""minDistance":${d("group_min_distance")},"maxDistance":${d("group_max_distance")},""" +
            s""""numberOfObjects":"${sortedHits.length}",""" +
            s""""objects":${sortedHits.map(encodeResult(_, cols, params)).mkString("[", ",", "]")}}"""
        }
      s"""{"results":[],$tookJson,"groupByResults":${groups.mkString("[", ",", "]")}}"""
    } else {
      val results = rows.map(encodeResult(_, cols, params)).mkString("[", ",", "]")
      s"""{"results":$results,$tookJson}"""
    }
  }
}
