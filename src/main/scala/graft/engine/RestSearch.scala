package graft.engine

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model._

/**
 * POST /v1/search/{collection}/near-text — the experimental REST search
 * endpoint (reference: adapters/handlers/rest/search/{handler,request,
 * reply}.go; acceptance test/acceptance/rest_search/near_text_test.go).
 *
 * Wire contract: body {query: [concepts], certainty?, distance?, limit?,
 * offset?, tenant?, where?, returnProperties? (dot-paths select across
 * references), returnMetadata? (distance|certainty|score|explainScore|
 * creationTime|lastUpdateTime)} → envelope {results: [{id, properties,
 * metadata?, references?}], tookMs}. The id lives on the envelope (never in
 * metadata); the metadata block is omitted when nothing populated; a user
 * property named "metadata" stays ordinary data under properties; reference
 * selections land under `references` as arrays; unselected properties are
 * never returned.
 *
 * Error statuses replay statusFromError (handler.go:255-321): unknown
 * collection/tenant 404; missing-tenant, not-active tenant, tenant on a
 * non-MT collection, no vectorizer, certainty-on-non-cosine, and
 * missing-inverted-index filters 422; bad where / unknown returnProperties
 * 400; bind-tier rejections (absent query, returnMetadata outside the
 * enum, reserved fields) 422 — all in the ErrorResponse body shape
 * {"error":[{"message": ...}]}.
 */
object RestSearch {

  private val MetadataKeys = Seq("distance", "certainty", "score",
    "explainScore", "creationTime", "lastUpdateTime")
  private val ReservedFields = Seq("singlePrompt", "groupedTask", "groupBy",
    "numberOfGroups", "objectsPerGroup", "rerank")
  private val DefaultLimit = 10 // QueryDefaults.Limit

  private final case class Api(status: Int, message: String)
    extends RuntimeException(message)
  private def apiFail(status: Int, msg: String): Nothing = throw Api(status, msg)

  private def errorBody(msg: String): String =
    JsonMethods.compact(JsonMethods.render(JObject(List("error" ->
      JArray(List(JObject(List("message" -> JString(msg)))))))))

  /** Serve one near-text search → (http status, JSON body). */
  def nearText(g: Graft, collection: String, json: String): (Int, String) =
    try {
      val jv = JsonMethods.parse(json)
      def strsOf(name: String): Option[Seq[String]] = jv \ name match {
        case JArray(xs) => Some(xs.map { case JString(s) => s
          case o => apiFail(422, s"$name in body must be an array of strings, got $o") })
        case JNothing | JNull => None
        case o => apiFail(422, s"$name in body must be an array of strings, got ${JsonMethods.compact(JsonMethods.render(o))}")
      }
      def numOf(name: String): Option[Double] = jv \ name match {
        case JDouble(d) => Some(d); case JInt(i) => Some(i.toDouble)
        case JLong(l) => Some(l.toDouble); case JDecimal(d) => Some(d.toDouble)
        case _ => None
      }
      // reserved fields reject before any schema access (request.go:35-50)
      ReservedFields.foreach(f =>
        if ((jv \ f) != JNothing) apiFail(422, s"$f is not yet supported"))
      // bind tier: query is a required body field; returnMetadata is a
      // swagger enum (near_text_test.go "rejected at bind time")
      val query = strsOf("query").getOrElse(
        apiFail(422, "query in body is required"))
      val returnMetadata = strsOf("returnMetadata").getOrElse(Nil)
      returnMetadata.find(!MetadataKeys.contains(_)).foreach(bad =>
        apiFail(422, s"""returnMetadata in body: unknown entry "$bad", """ +
          s"expected one of ${MetadataKeys.mkString(", ")}"))
      if (query.isEmpty || query.exists(_.isEmpty))
        apiFail(400, "query must not be empty")

      if (!g.hasCollection(collection))
        apiFail(404, s"could not find collection $collection in schema")
      val c = g.collection(collection)
      val tenant = (jv \ "tenant") match {
        case JString(t) if t.nonEmpty => Some(t); case _ => None }
      // tenant on a non-MT collection (ErrMultiTenancy → 422)
      if (tenant.isDefined && c.schema.tenantColumn.isEmpty)
        apiFail(422, s"class $collection has multi-tenancy disabled, " +
          "but request was with tenant")
      // checkVectorizer (request.go:253-274): a vector-less class cannot
      // embed the query
      if (c.schema.vectors.isEmpty)
        apiFail(422, s"near-text is not supported: collection $collection " +
          """has no vectorizer module configured for target vector """")

      val where = (jv \ "where") match {
        case JNothing | JNull => None
        case w => Some(
          try WireDecoder.restParse(g, collection, w)
          catch { case e: WireDecoder.WireError =>
            apiFail(400, s"invalid 'where' filter: ${e.getMessage}") })
      }

      // returnProperties (request.go:302-420): absent = all non-ref
      // non-blob properties; dot-paths select across references only
      val allProps = c.schema.properties
      val (propRoots, refSelections): (Seq[String], Map[String, Seq[String]]) =
        strsOf("returnProperties") match {
          case None =>
            (allProps.collect { case p
              if p.dataType != PropType.Ref && p.dataType != PropType.Blob => p.name },
             Map.empty)
          case Some(entries) =>
            val props = Seq.newBuilder[String]
            var refs = Map.empty[String, Seq[String]]
            entries.foreach { entry0 =>
              if (entry0.isEmpty) apiFail(400, "returnProperties entries must not be empty")
              val (root0, sub) = entry0.span(_ != '.')
              val root = root0.head.toLower + root0.tail
              val prop = c.schema.property(root).getOrElse(apiFail(400,
                s"no such prop with name '$root' found in class '${c.schema.name}'"))
              if (prop.dataType == PropType.Ref) {
                val subSel = if (sub.startsWith(".")) Seq(sub.drop(1)) else Nil
                refs += root -> (refs.getOrElse(root, Nil) ++ subSel)
              } else {
                if (sub.nonEmpty) apiFail(400, s"""returnProperties: "$root" is """ +
                  "not a reference property, dot-paths only select across references")
                props += root
              }
            }
            (props.result().distinct, refs)
        }

      val additional = Set("id") ++ returnMetadata.map {
        case "creationTime" => "creationTimeUnix"
        case "lastUpdateTime" => "lastUpdateTimeUnix"
        case other => other
      }
      val params = GetParams(
        collection = collection,
        where = where,
        nearText = Some(NearText(query, metric = Metric.Default,
          certainty = numOf("certainty"), distance = numOf("distance"))),
        pagination = Some(Pagination(
          offset = numOf("offset").map(_.toInt).getOrElse(0),
          limit = numOf("limit").map(_.toInt).filter(_ > 0).getOrElse(DefaultLimit))),
        // ref roots ride properties too, like the GraphQL decode — the
        // projection serves <ref>_resolved alongside
        properties = propRoots ++ refSelections.keys.toSeq.sorted,
        additional = additional,
        resolveRefs = refSelections.keys.toSeq.sorted,
        tenant = tenant)

      val before = System.nanoTime()
      val page = try g.get(params) catch {
        case e: Exception => apiFail(classify(e.getMessage), e.getMessage)
      }
      val rows = try page.collect() catch {
        case e: Exception => apiFail(classify(rootMsg(e)), rootMsg(e))
      }
      val cols = page.columns.zipWithIndex.toMap
      val results = rows.toList.map { r =>
        def cell(name: String): Option[Any] =
          cols.get(name).filter(i => !r.isNullAt(i)).map(r.get)
        val props = JObject(propRoots.flatMap(p =>
          cell(p).map(v => p -> jval(v))).toList)
        val md = List(
          returnMetadata.contains("distance") ->
            ("distance", cell("_distance").map(jval)),
          returnMetadata.contains("certainty") ->
            ("certainty", cell("_certainty").map(jval)),
          returnMetadata.contains("score") ->
            ("score", cell("_score").map(jval)),
          returnMetadata.contains("explainScore") ->
            ("explainScore", cell("_explainScore").map(jval)),
          returnMetadata.contains("creationTime") ->
            ("creationTime", cell("_creationTimeUnix").map(jval)),
          returnMetadata.contains("lastUpdateTime") ->
            ("lastUpdateTime", cell("_lastUpdateTimeUnix").map(jval))
        ).collect { case (true, (k, Some(v))) => k -> v }
        val refs = refSelections.toList.sortBy(_._1).flatMap { case (refName, subs) =>
          cell(s"${refName}_resolved").map { v =>
            val hits = v.asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]].toSeq.map { h =>
              val fields =
                if (subs.isEmpty) h.schema.fields.map(_.name).toSeq else subs
              JObject(fields.flatMap(f =>
                h.schema.fields.find(_.name == f)
                  .filter(sf => !h.isNullAt(h.fieldIndex(f)))
                  .map(_ => f -> jval(h.get(h.fieldIndex(f))))).toList)
            }
            refName -> JArray(hits.toList)
          }
        }
        JObject(List(
          "id" -> JString(String.valueOf(r.get(cols("_id"))))) ++
          List("properties" -> props) ++
          (if (md.nonEmpty) List("metadata" -> JObject(md)) else Nil) ++
          (if (refs.nonEmpty) List("references" -> JObject(refs)) else Nil))
      }
      val tookMs = (System.nanoTime() - before) / 1000000L
      (200, JsonMethods.compact(JsonMethods.render(JObject(List(
        "results" -> JArray(results), "tookMs" -> JLong(tookMs))))))
    } catch {
      case Api(status, msg) => (status, errorBody(msg))
      case e: Exception =>
        val msg = rootMsg(e)
        (classify(msg), errorBody(msg))
    }

  private def rootMsg(e: Throwable): String = {
    var cur = e
    while (cur.getCause != null && cur.getCause != cur) cur = cur.getCause
    Option(cur.getMessage).getOrElse(cur.getClass.getSimpleName)
  }

  /** statusFromError (handler.go:255-321) over the engine's error texts. */
  private def classify(msg0: String): Int = {
    val msg = Option(msg0).getOrElse("")
    if (msg.contains("tenant not found")) 404
    else if (msg.contains("tenant not active")) 422
    else if (msg.contains("multi-tenancy")) 422
    else if (msg.contains("could not find collection") ||
             msg.contains("could not find class") ||
             msg.contains("unknown collection")) 404
    else if (msg.contains("vectorizer") || msg.contains("embedder")) 422
    else if (msg.contains("can't compute and return certainty")) 422
    else if (msg.contains("requires inverted index")) 422
    else if (msg.contains("invalid 'where' filter")) 400
    else if (msg.contains("no such prop")) 400
    else 500
  }

  private def jval(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case bd: java.math.BigDecimal => JDecimal(BigDecimal(bd))
    case t: java.sql.Timestamp =>
      JString(java.time.OffsetDateTime.ofInstant(t.toInstant,
        java.time.ZoneOffset.UTC).toString)
    case r: org.apache.spark.sql.Row =>
      JObject(r.schema.fields.zipWithIndex.toList.collect {
        case (f, i) if !r.isNullAt(i) => f.name -> jval(r.get(i)) })
    case seq: scala.collection.Seq[_] => JArray(seq.toList.map(jval))
    case a: Array[_] => JArray(a.toList.map(jval))
    case other => JString(other.toString)
  }
}
