package graft.engine

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model._

/**
 * The MCP `weaviate-query-hybrid` tool (adapters/handlers/mcp/search/
 * hybrid.go + schema.go QueryHybridArgs) — the newest wire shape onto the
 * SAME hybrid path every other transport drives: a flat JSON argument
 * object with query/collection_name/tenant_name/alpha/limit/
 * target_vectors/target_properties/return_properties/return_metadata and a
 * REST-style `filters` tree (filterext.Parse — the models.WhereFilter
 * format, shared with the REST batch-delete wire).
 *
 * Contract notes, all from hybrid.go:
 *  - absent alpha → common_filters.DefaultAlpha 0.75 (UNLIKE the gRPC
 *    legacy path's raw proto3 zero);
 *  - absent return_properties → all non-ref non-blob props;
 *  - absent limit → no explicit pagination (the engine's default applies);
 *  - return_metadata entries map onto the additional set (id/vector/
 *    distance/score/creationTimeUnix/lastUpdateTimeUnix...).
 */
object McpSearch {

  val ToolName = "weaviate-query-hybrid"

  /** The tools_list contract for the query tool (schema.go Tools): name,
   * description, and the MCP behavior annotations. */
  def toolDescriptor: Map[String, String] = Map(
    "name" -> ToolName,
    "description" -> "Performs hybrid search (vector + keyword) for data in a collection.",
    "readOnlyHint" -> "true",
    "destructiveHint" -> "false",
    "idempotentHint" -> "true")

  def queryHybrid(g: Graft, json: String): DataFrame = {
    val jv = JsonMethods.parse(json)
    def str(k: String): Option[String] = jv \ k match {
      case JString(s) if s.nonEmpty => Some(s)
      case _ => None
    }
    def strs(k: String): Seq[String] = jv \ k match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }
    val collection = str("collection_name").getOrElse(
      throw new IllegalArgumentException("collection_name is required"))
    g.collection(collection) // unknown collection errors first
    val query = (jv \ "query") match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("query is required")
    }
    val alpha = (jv \ "alpha") match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case _ => 0.75 // common_filters.DefaultAlpha (hybrid.go:79-82)
    }
    val limit = (jv \ "limit") match {
      case JInt(i) => Some(i.toInt)
      case JLong(l) => Some(l.toInt)
      case _ => None
    }
    val where = (jv \ "filters") match {
      case JNothing | JNull => None
      case f => Some(WireDecoder.restWhere(g, collection,
        JsonMethods.compact(JsonMethods.render(f))))
    }
    // return_metadata → additional set (buildAdditionalProperties)
    val additional = strs("return_metadata").flatMap {
      case "id" | "uuid" => Some("id")
      case "vector" => Some("vector")
      case "distance" => Some("distance")
      case "certainty" => Some("certainty")
      case "score" => Some("score")
      case "explainScore" => Some("explainScore")
      case "creationTimeUnix" => Some("creationTimeUnix")
      case "lastUpdateTimeUnix" => Some("lastUpdateTimeUnix")
      case _ => None
    }.toSet
    g.get(GetParams(
      collection = collection,
      where = where,
      hybrid = Some(Hybrid(query, alpha = alpha,
        properties = strs("target_properties"),
        targetVectors = strs("target_vectors"))),
      pagination = limit.map(l => Pagination(limit = l)),
      properties = strs("return_properties"),
      additional = additional,
      tenant = str("tenant_name")))
  }
}

/**
 * The MCP write/read tools beside the query tool: `weaviate-objects-upsert`
 * (adapters/handlers/mcp/create/objects_upsert.go — one more decode onto
 * the existing batch-add path), `weaviate-collections-get-config` and
 * `weaviate-tenants-list` (adapters/handlers/mcp/read).
 *
 * Error contract (objects_upsert.go): function-level failures THROW — an
 * empty batch ("at least one object is required", line 58) and a malformed
 * uuid ("invalid UUID for object", line 84, checked while converting the
 * whole batch before any write); everything else is a PER-OBJECT error in
 * the result list, exactly the batch path's per-item semantics (unknown
 * class "class 'X' not present in schema" batch_add.go:227, property
 * validation texts, the named-vector config check
 * validation/vector_validation.go:60).
 */
object McpCreate {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  val ToolName = "weaviate-objects-upsert"

  final case class UpsertResult(id: String, error: String)

  def upsertObjects(g: Graft, json: String,
                    store: String => Option[graft.sources.CollectionStore],
                    nextId: () => String): Seq[UpsertResult] = {
    val jv = JsonMethods.parse(json)
    val collection = (jv \ "collection_name") match {
      case JString(s) => s; case _ => ""
    }
    val tenant = (jv \ "tenant_name") match {
      case JString(s) if s.nonEmpty => Some(s); case _ => None
    }
    val objs = (jv \ "objects") match { case JArray(xs) => xs; case _ => Nil }
    if (objs.isEmpty)
      throw new IllegalArgumentException("at least one object is required")
    // uuid SHAPE is a conversion-time failure for the whole call
    objs.foreach { o =>
      (o \ "uuid") match {
        case JString(u) if u.nonEmpty && !WireDecoder.UuidRe.matches(u) =>
          throw new IllegalArgumentException("invalid UUID for object")
        case _ => ()
      }
    }
    if (!g.hasCollection(collection))
      return objs.map(_ => UpsertResult("",
        s"class '$collection' not present in schema"))
    val schema = g.collection(collection).schema
    // multi-tenancy gates ride every item (the batch path validates per
    // object; one shared failure here)
    val tenantErr: Option[String] = schema.tenantColumn match {
      case Some(_) if tenant.isEmpty => Some(
        s"class ${schema.name} has multi-tenancy enabled, but request was without tenant")
      case Some(_) if !g.tenants(schema.name).exists(_.name == tenant.get) =>
        Some(s"tenant not found: ${tenant.get}")
      case None if tenant.nonEmpty => Some(
        s"class ${schema.name} has multi-tenancy disabled, but request was with tenant")
      case _ => None
    }
    tenantErr match {
      case Some(e) => return objs.map(_ => UpsertResult("", e))
      case None => ()
    }
    val st = store(collection).getOrElse(throw new IllegalStateException(
      s"no store registered for $collection"))
    val storeSchema = st.read().schema
    // existing dimensionality per vector column: the index's dimension
    // contract (a second write at a new length is the reference's hnsw
    // "vector lengths don't match" rejection)
    def storedDim(colName: String): Option[Int] =
      if (!storeSchema.fieldNames.contains(colName)) None
      else st.read().select(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col(colName)).as("d"))
        .filter(org.apache.spark.sql.functions.col("d") > 0)
        .limit(1).collect().headOption.map(_.getInt(0))
    val decoded: Seq[Either[String, (String, Map[String, Any], Map[String, Array[Float]])]] =
      objs.map { o =>
        try {
          val props: Map[String, JValue] = (o \ "properties") match {
            case JObject(kvs) => kvs.toMap; case _ => Map.empty
          }
          // null property values are allowed — the prop is simply unset
          val values = WireDecoder.restObjectValues(schema,
            WireDecoder.RestObject(collection, None, None, tenant,
              props.filter(_._2 != JNull), Map.empty))
          val vecs: Map[String, Array[Float]] = (o \ "vectors") match {
            case JObject(kvs) => kvs.map {
              case (n, JArray(xs)) => n -> xs.map {
                case JDouble(d) => d.toFloat
                case JInt(i) => i.toFloat
                case JLong(l) => l.toFloat
                case other => throw new IllegalArgumentException(
                  s"vectors.$n: not a number: $other")
              }.toArray
              case (n, other) => throw new IllegalArgumentException(
                s"vectors.$n: expected a float list, got $other")
            }.toMap
            case _ => Map.empty
          }
          // shared write-path guard: no-configuration + dropped-marker texts
          g.validateVectorWrite(collection, vecs.keys)
          vecs.foreach { case (n, v) =>
            storedDim(schema.vectors(n))
              .filter(d => v.nonEmpty && d != v.length)
              .foreach(d => throw new IllegalArgumentException(
                s"""vector lengths don't match for vector "$n": $d vs ${v.length}"""))
          }
          val id = (o \ "uuid") match {
            case JString(u) if u.nonEmpty => u.toLowerCase
            case _ => nextId()
          }
          Right((id, values, vecs))
        } catch {
          case e: Exception =>
            Left(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        }
      }
    val valid = decoded.collect { case Right(v) => v }
    if (valid.nonEmpty) {
      val rows = valid.map { case (id, values, vecs) =>
        org.apache.spark.sql.Row.fromSeq(storeSchema.fields.toSeq.map { f =>
          if (f.name == schema.idColumn) id
          else if (schema.tenantColumn.contains(f.name)) tenant.orNull
          else schema.vectors.collectFirst {
            case (n, cn) if cn == f.name && vecs.contains(n) => vecs(n).toSeq
          }.getOrElse(values.get(f.name).orNull)
        })
      }
      val sess = st.read().sparkSession
      // LocalRelation: exact size estimate for the adaptive write width
      st.upsert(sess.createDataFrame(
        java.util.Arrays.asList(rows: _*), storeSchema))
      g.register(schema, st.read())
    }
    decoded.map {
      case Right((id, _, _)) => UpsertResult(id, "")
      case Left(e) => UpsertResult("", e)
    }
  }
}

/** The MCP read tools (adapters/handlers/mcp/read): get-config lists every
 * collection's class config (or one, when collection_name is given) and
 * tenants-list a class's tenants. */
object McpRead {
  /** GetCollectionConfigResp.Collections — class names, all or one. */
  def getConfig(g: Graft, collectionName: Option[String]): Seq[String] =
    collectionName match {
      case Some(n) => Seq(g.collection(n).schema.name)
      case None => g.collectionNames
    }
  /** GetTenantsResp.Tenants — (name, activityStatus) pairs. */
  def listTenants(g: Graft, collectionName: String): Seq[(String, String)] =
    g.tenants(collectionName).map(t => t.name -> t.activityStatus.name)
}
