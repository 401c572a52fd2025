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
