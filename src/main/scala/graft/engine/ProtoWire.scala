package graft.engine

import org.json4s._

import graft.model.GetParams

/**
 * Binary protobuf transport for the gRPC `SearchRequest` — the byte shape a
 * real weaviate gRPC client puts on the wire (grpc/proto/v1/search_get.proto
 * + base.proto + base_search.proto). The engine's [[WireDecoder.decodeSearch]]
 * consumes the protojson rendition; this module closes the remaining gap by
 * reading proto wire format (varint / fixed64 / length-delimited / fixed32,
 * packed repeated scalars, nested messages, maps, oneofs-as-fields) against
 * hand-authored descriptors of the reference's message subset and emitting
 * exactly that protojson JValue — one decode path, two transports.
 *
 * The container has no protobuf-java (offline resolver), so the wire codec
 * is hand-rolled from the public protobuf encoding spec; a symmetric writer
 * (same descriptors) authors byte-exact fixtures for the gates/specs.
 */
object ProtoWire {

  import WireDecoder.WireError
  private def fail(msg: String): Nothing = throw new WireError(msg)

  // ==========================================================================
  // Descriptors
  // ==========================================================================

  sealed trait FType
  case object TString extends FType
  case object TBytes extends FType            // → base64 string (protojson)
  case object TBool extends FType
  case object TInt32 extends FType            // int32/uint32/sint-less varint
  case object TInt64 extends FType            // int64/uint64 varint
  case object TDouble extends FType           // fixed64
  case object TFloat extends FType            // fixed32
  final case class TEnum(values: Map[Int, String]) extends FType
  final case class TMsg(name: String) extends FType
  /** map<string, bytes>-style entry (key field 1, value field 2). */
  final case class TMap(value: FType) extends FType
  /** google.protobuf.Struct — protojson renders it as the plain JSON object
   * itself (batch.proto BatchObject.Properties.non_ref_properties). */
  case object TStruct extends FType
  /** weaviate's typed Properties map (grpc/proto/v1/properties.proto —
   * map<string, Value> with the engine-typed Value oneof); protojson side
   * is a plain JSON object like TStruct, but the byte side carries the
   * reference's typed kinds (int_value/text_value/number_values-as-bytes…). */
  case object TProps extends FType

  final case class FieldSpec(name: String, tpe: FType, repeated: Boolean = false)
  type Msg = Map[Int, FieldSpec]

  private def f(n: Int, name: String, t: FType, rep: Boolean = false): (Int, FieldSpec) =
    n -> FieldSpec(name, t, rep)

  private val filtersOperator = TEnum(Map(
    0 -> "OPERATOR_UNSPECIFIED", 1 -> "OPERATOR_EQUAL", 2 -> "OPERATOR_NOT_EQUAL",
    3 -> "OPERATOR_GREATER_THAN", 4 -> "OPERATOR_GREATER_THAN_EQUAL",
    5 -> "OPERATOR_LESS_THAN", 6 -> "OPERATOR_LESS_THAN_EQUAL",
    7 -> "OPERATOR_AND", 8 -> "OPERATOR_OR", 9 -> "OPERATOR_WITHIN_GEO_RANGE",
    10 -> "OPERATOR_LIKE", 11 -> "OPERATOR_IS_NULL", 12 -> "OPERATOR_CONTAINS_ANY",
    13 -> "OPERATOR_CONTAINS_ALL", 14 -> "OPERATOR_CONTAINS_NONE", 15 -> "OPERATOR_NOT"))

  private val fusionType = TEnum(Map(
    0 -> "FUSION_TYPE_UNSPECIFIED", 1 -> "FUSION_TYPE_RANKED", 2 -> "FUSION_TYPE_RELATIVE_SCORE"))

  private val combinationMethod = TEnum(Map(
    0 -> "COMBINATION_METHOD_UNSPECIFIED", 1 -> "COMBINATION_METHOD_TYPE_SUM",
    2 -> "COMBINATION_METHOD_TYPE_MIN", 3 -> "COMBINATION_METHOD_TYPE_AVERAGE",
    4 -> "COMBINATION_METHOD_TYPE_RELATIVE_SCORE", 5 -> "COMBINATION_METHOD_TYPE_MANUAL"))

  private val searchOperator = TEnum(Map(
    0 -> "OPERATOR_UNSPECIFIED", 1 -> "OPERATOR_OR", 2 -> "OPERATOR_AND"))

  private val vectorType = TEnum(Map(
    0 -> "VECTOR_TYPE_UNSPECIFIED", 1 -> "VECTOR_TYPE_SINGLE_FP32", 2 -> "VECTOR_TYPE_MULTI_FP32"))

  private val decayCurve = TEnum(Map(
    0 -> "DECAY_CURVE_UNSPECIFIED", 1 -> "DECAY_CURVE_GAUSS",
    2 -> "DECAY_CURVE_LINEAR", 3 -> "DECAY_CURVE_EXPONENTIAL"))

  /** The reference's message subset, field numbers verbatim from the protos. */
  val messages: Map[String, Msg] = Map(
    "SearchRequest" -> Map(
      f(1, "collection", TString), f(10, "tenant", TString),
      f(20, "properties", TMsg("PropertiesRequest")),
      f(21, "metadata", TMsg("MetadataRequest")),
      f(22, "group_by", TMsg("GroupBy")),
      f(30, "limit", TInt32), f(31, "offset", TInt32), f(32, "autocut", TInt32),
      f(33, "after", TString),
      f(34, "sort_by", TMsg("SortBy"), rep = true),
      f(40, "filters", TMsg("Filters")),
      f(41, "hybrid_search", TMsg("Hybrid")),
      f(42, "bm25_search", TMsg("BM25")),
      f(43, "near_vector", TMsg("NearVector")),
      f(44, "near_object", TMsg("NearObject")),
      f(45, "near_text", TMsg("NearTextSearch")),
      f(62, "boost", TMsg("Boost")),
      f(100, "uses_123_api", TBool), f(101, "uses_125_api", TBool),
      f(102, "uses_127_api", TBool)),
    // batch_delete.proto:11-32 — grpc_test.go's binary BatchDelete arm
    "BatchDeleteRequest" -> Map(
      f(1, "collection", TString), f(2, "filters", TMsg("Filters")),
      f(3, "verbose", TBool), f(4, "dry_run", TBool), f(6, "tenant", TString)),
    "BatchDeleteReply" -> Map(
      f(1, "took", TFloat), f(2, "failed", TInt64), f(3, "matches", TInt64),
      f(4, "successful", TInt64), f(5, "objects", TMsg("BatchDeleteObject"), rep = true)),
    "BatchDeleteObject" -> Map(
      f(1, "uuid", TBytes), f(2, "successful", TBool), f(3, "error", TString)),
    // Boost post-scoring (search_get.proto:218-263)
    "Boost" -> Map(
      f(1, "conditions", TMsg("BoostCondition"), rep = true),
      f(2, "weight", TFloat), f(3, "depth", TInt32)),
    "BoostCondition" -> Map(
      f(1, "filter", TMsg("Filters")),
      f(2, "time_decay", TMsg("TimeDecayFunction")),
      f(3, "property_value", TMsg("PropertyValueFunction")),
      f(4, "numeric_decay", TMsg("NumericDecayFunction")),
      f(5, "weight", TFloat)),
    "TimeDecayFunction" -> Map(
      f(1, "property", TString), f(2, "origin", TString), f(3, "scale", TString),
      f(4, "offset", TString), f(5, "curve", decayCurve), f(6, "decay_value", TFloat)),
    "NumericDecayFunction" -> Map(
      f(1, "property", TString), f(2, "origin", TDouble), f(3, "scale", TDouble),
      f(4, "offset", TDouble), f(5, "curve", decayCurve), f(6, "decay_value", TFloat)),
    "PropertyValueFunction" -> Map(
      f(1, "property", TString), f(2, "modifier", TEnum(Map(
        0 -> "PROPERTY_VALUE_MODIFIER_UNSPECIFIED",
        1 -> "PROPERTY_VALUE_MODIFIER_LOG1P",
        2 -> "PROPERTY_VALUE_MODIFIER_SQRT")))),
    "PropertiesRequest" -> Map(
      f(1, "non_ref_properties", TString, rep = true),
      f(2, "ref_properties", TMsg("RefPropertiesRequest"), rep = true),
      f(3, "object_properties", TMsg("ObjectPropertiesRequest"), rep = true),
      f(11, "return_all_nonref_properties", TBool)),
    "RefPropertiesRequest" -> Map(
      f(1, "reference_property", TString),
      f(2, "properties", TMsg("PropertiesRequest")),
      f(3, "metadata", TMsg("MetadataRequest")),
      f(4, "target_collection", TString)),
    "ObjectPropertiesRequest" -> Map(
      f(1, "prop_name", TString),
      f(2, "primitive_properties", TString, rep = true),
      f(3, "object_properties", TMsg("ObjectPropertiesRequest"), rep = true)),
    "MetadataRequest" -> Map(
      f(1, "uuid", TBool), f(2, "vector", TBool), f(3, "creation_time_unix", TBool),
      f(4, "last_update_time_unix", TBool), f(5, "distance", TBool),
      f(6, "certainty", TBool), f(7, "score", TBool), f(8, "explain_score", TBool),
      f(9, "is_consistent", TBool), f(10, "vectors", TString, rep = true)),
    "GroupBy" -> Map(
      f(1, "path", TString, rep = true),
      f(2, "number_of_groups", TInt32), f(3, "objects_per_group", TInt32)),
    "SortBy" -> Map(
      f(1, "ascending", TBool), f(2, "path", TString, rep = true)),
    "Filters" -> Map(
      f(1, "operator", filtersOperator),
      f(2, "on", TString, rep = true),
      f(3, "filters", TMsg("Filters"), rep = true),
      f(4, "value_text", TString), f(5, "value_int", TInt64),
      f(6, "value_boolean", TBool), f(7, "value_number", TDouble),
      f(9, "value_text_array", TMsg("TextArray")),
      f(10, "value_int_array", TMsg("IntArray")),
      f(11, "value_boolean_array", TMsg("BooleanArray")),
      f(12, "value_number_array", TMsg("NumberArray")),
      f(13, "value_geo", TMsg("GeoCoordinatesFilter")),
      f(20, "target", TMsg("FilterTarget"))),
    "FilterTarget" -> Map(
      f(1, "property", TString),
      f(2, "single_target", TMsg("FilterReferenceSingleTarget")),
      f(3, "multi_target", TMsg("FilterReferenceMultiTarget")),
      f(4, "count", TMsg("FilterReferenceCount"))),
    "FilterReferenceSingleTarget" -> Map(
      f(1, "on", TString), f(2, "target", TMsg("FilterTarget"))),
    "FilterReferenceMultiTarget" -> Map(
      f(1, "on", TString), f(2, "target", TMsg("FilterTarget")),
      f(3, "target_collection", TString)),
    "FilterReferenceCount" -> Map(f(1, "on", TString)),
    "GeoCoordinatesFilter" -> Map(
      f(1, "latitude", TFloat), f(2, "longitude", TFloat), f(3, "distance", TFloat)),
    "TextArray" -> Map(f(1, "values", TString, rep = true)),
    "IntArray" -> Map(f(1, "values", TInt64, rep = true)),
    "NumberArray" -> Map(f(1, "values", TDouble, rep = true)),
    "BooleanArray" -> Map(f(1, "values", TBool, rep = true)),
    "Targets" -> Map(
      f(1, "target_vectors", TString, rep = true),
      f(2, "combination", combinationMethod),
      f(4, "weights_for_targets", TMsg("WeightsForTarget"), rep = true)),
    "WeightsForTarget" -> Map(f(1, "target", TString), f(2, "weight", TFloat)),
    "VectorForTarget" -> Map(
      f(1, "name", TString), f(2, "vector_bytes", TBytes),
      f(3, "vectors", TMsg("Vectors"), rep = true)),
    "Vectors" -> Map(
      f(1, "name", TString), f(2, "index", TInt64), f(3, "vector_bytes", TBytes),
      f(4, "type", vectorType)),
    "SearchOperatorOptions" -> Map(
      f(1, "operator", searchOperator), f(2, "minimum_or_tokens_match", TInt32)),
    "BM25" -> Map(
      f(1, "query", TString), f(2, "properties", TString, rep = true),
      f(3, "search_operator", TMsg("SearchOperatorOptions"))),
    "Hybrid" -> Map(
      f(1, "query", TString), f(2, "properties", TString, rep = true),
      f(3, "vector", TFloat, rep = true), f(4, "alpha", TFloat),
      f(5, "fusion_type", fusionType), f(6, "vector_bytes", TBytes),
      f(7, "target_vectors", TString, rep = true),
      f(8, "near_text", TMsg("NearTextSearch")),
      f(9, "near_vector", TMsg("NearVector")),
      f(10, "targets", TMsg("Targets")),
      f(11, "bm25_search_operator", TMsg("SearchOperatorOptions")),
      f(12, "alpha_param", TFloat), f(13, "use_alpha_param", TBool),
      f(14, "selection", TMsg("Selection")),
      f(20, "vector_distance", TDouble),
      f(21, "vectors", TMsg("Vectors"), rep = true)),
    // post-fusion result selection (base_search.proto:38-46) — MMR today
    "Selection" -> Map(f(1, "mmr", TMsg("SelectionMMR"))),
    "SelectionMMR" -> Map(f(1, "limit", TInt32), f(2, "balance", TFloat)),
    "NearVector" -> Map(
      f(1, "vector", TFloat, rep = true), f(2, "certainty", TDouble),
      f(3, "distance", TDouble), f(4, "vector_bytes", TBytes),
      f(5, "target_vectors", TString, rep = true), f(6, "targets", TMsg("Targets")),
      f(7, "vector_per_target", TMap(TBytes)),
      f(8, "vector_for_targets", TMsg("VectorForTarget"), rep = true),
      f(9, "vectors", TMsg("Vectors"), rep = true)),
    "NearObject" -> Map(
      f(1, "id", TString), f(2, "certainty", TDouble), f(3, "distance", TDouble),
      f(4, "target_vectors", TString, rep = true), f(5, "targets", TMsg("Targets"))),
    "NearTextSearch" -> Map(
      f(1, "query", TString, rep = true), f(2, "certainty", TDouble),
      f(3, "distance", TDouble), f(4, "move_to", TMsg("Move")),
      f(5, "move_away", TMsg("Move")),
      f(6, "target_vectors", TString, rep = true), f(7, "targets", TMsg("Targets"))),
    "Move" -> Map(
      f(1, "force", TFloat), f(2, "concepts", TString, rep = true),
      f(3, "uuids", TString, rep = true)),

    // ----- AggregateRequest (grpc/proto/v1/aggregate.proto) ---------------
    "AggregateRequest" -> Map(
      f(1, "collection", TString), f(10, "tenant", TString),
      f(20, "objects_count", TBool),
      f(21, "aggregations", TMsg("Aggregation"), rep = true),
      f(30, "object_limit", TInt32),
      f(31, "group_by", TMsg("AggregateGroupBy")),
      f(32, "limit", TInt32),
      f(40, "filters", TMsg("Filters")),
      f(41, "hybrid", TMsg("Hybrid")),
      f(42, "near_vector", TMsg("NearVector")),
      f(43, "near_object", TMsg("NearObject")),
      f(44, "near_text", TMsg("NearTextSearch"))),
    "AggregateGroupBy" -> Map(
      f(1, "collection", TString), f(2, "property", TString)),
    "Aggregation" -> Map(
      f(1, "property", TString),
      f(2, "int", TMsg("AggregationInt")),
      f(3, "number", TMsg("AggregationInt")), // same flag set as Integer
      f(4, "text", TMsg("AggregationText")),
      f(5, "boolean", TMsg("AggregationBoolean")),
      f(6, "date", TMsg("AggregationDate")),
      f(7, "reference", TMsg("AggregationReference"))),
    "AggregationInt" -> Map(
      f(1, "count", TBool), f(2, "type", TBool), f(3, "sum", TBool),
      f(4, "mean", TBool), f(5, "mode", TBool), f(6, "median", TBool),
      f(7, "maximum", TBool), f(8, "minimum", TBool)),
    "AggregationText" -> Map(
      f(1, "count", TBool), f(2, "type", TBool),
      f(3, "top_occurences", TBool),           // proto's misspelling, verbatim
      f(4, "top_occurences_limit", TInt32)),
    "AggregationBoolean" -> Map(
      f(1, "count", TBool), f(2, "type", TBool), f(3, "total_true", TBool),
      f(4, "total_false", TBool), f(5, "percentage_true", TBool),
      f(6, "percentage_false", TBool)),
    "AggregationDate" -> Map(
      f(1, "count", TBool), f(2, "type", TBool), f(3, "median", TBool),
      f(4, "mode", TBool), f(5, "maximum", TBool), f(6, "minimum", TBool)),
    "AggregationReference" -> Map(
      f(1, "type", TBool), f(2, "pointing_to", TBool)),

    // ----- BatchObjectsRequest (grpc/proto/v1/batch.proto + base.proto) ---
    "BatchObjectsRequest" -> Map(
      f(1, "objects", TMsg("BatchObject"), rep = true)),
    "BatchReferencesRequest" -> Map(
      f(1, "references", TMsg("BatchReference"), rep = true)),
    // ----- BatchStream (grpc/proto/v1/batch.proto:22-90) ------------------
    "BatchStreamRequest" -> Map(
      f(1, "start", TMsg("BatchStreamStart")),
      f(2, "data", TMsg("BatchStreamData")),
      f(3, "stop", TMsg("BatchStreamStop"))),
    "BatchStreamStart" -> Map(f(1, "consistency_level", TInt32)),
    "BatchStreamStop" -> Map.empty,
    "BatchStreamData" -> Map(
      f(1, "objects", TMsg("BatchStreamDataObjects")),
      f(2, "references", TMsg("BatchStreamDataReferences"))),
    "BatchStreamDataObjects" -> Map(
      f(1, "values", TMsg("BatchObject"), rep = true)),
    "BatchStreamDataReferences" -> Map(
      f(1, "values", TMsg("BatchReference"), rep = true)),
    "BatchReference" -> Map(
      f(1, "name", TString), f(2, "from_collection", TString),
      f(3, "from_uuid", TString), f(4, "to_collection", TString),
      f(5, "to_uuid", TString), f(6, "tenant", TString)),
    "BatchStreamReply" -> Map(
      f(1, "results", TMsg("BatchStreamResults")),
      f(2, "shutting_down", TMsg("BatchStreamShuttingDown")),
      f(4, "started", TMsg("BatchStreamStarted")),
      f(5, "backoff", TMsg("BatchStreamBackoff")),
      f(6, "acks", TMsg("BatchStreamAcks")),
      f(7, "out_of_memory", TMsg("BatchStreamOutOfMemory"))),
    "BatchStreamStarted" -> Map.empty,
    "BatchStreamShuttingDown" -> Map.empty,
    "BatchStreamBackoff" -> Map(f(1, "batch_size", TInt32)),
    "BatchStreamAcks" -> Map(
      f(1, "uuids", TString, rep = true), f(2, "beacons", TString, rep = true)),
    "BatchStreamOutOfMemory" -> Map(
      f(1, "uuids", TString, rep = true), f(2, "beacons", TString, rep = true),
      f(3, "wait_time", TInt32)),
    "BatchStreamResults" -> Map(
      f(1, "errors", TMsg("BatchStreamResultError"), rep = true),
      f(2, "successes", TMsg("BatchStreamResultSuccess"), rep = true)),
    "BatchStreamResultError" -> Map(
      f(1, "error", TString), f(2, "uuid", TString), f(3, "beacon", TString)),
    "BatchStreamResultSuccess" -> Map(
      f(2, "uuid", TString), f(3, "beacon", TString)),
    "BatchObject" -> Map(
      f(1, "uuid", TString), f(2, "vector", TFloat, rep = true),
      f(3, "properties", TMsg("BatchObjectProperties")),
      f(4, "collection", TString), f(5, "tenant", TString),
      f(6, "vector_bytes", TBytes),
      f(23, "vectors", TMsg("Vectors"), rep = true)),
    "BatchObjectProperties" -> Map(
      f(1, "non_ref_properties", TStruct),
      f(2, "single_target_ref_props", TMsg("SingleTargetRefProps"), rep = true),
      f(3, "multi_target_ref_props", TMsg("MultiTargetRefProps"), rep = true),
      f(4, "number_array_properties", TMsg("NumberArrayProperties"), rep = true),
      f(5, "int_array_properties", TMsg("IntArrayProperties"), rep = true),
      f(6, "text_array_properties", TMsg("TextArrayProperties"), rep = true),
      f(7, "boolean_array_properties", TMsg("BooleanArrayProperties"), rep = true),
      f(8, "object_properties", TMsg("ObjectProps"), rep = true),
      f(9, "object_array_properties", TMsg("ObjectArrayProps"), rep = true),
      f(10, "empty_list_props", TString, rep = true)),
    // nested object payloads (base.proto:40-59)
    "ObjectProps" -> Map(
      f(1, "value", TMsg("ObjectPropertiesValue")), f(2, "prop_name", TString)),
    "ObjectArrayProps" -> Map(
      f(1, "values", TMsg("ObjectPropertiesValue"), rep = true),
      f(2, "prop_name", TString)),
    "ObjectPropertiesValue" -> Map(
      f(1, "non_ref_properties", TStruct),
      f(2, "number_array_properties", TMsg("NumberArrayProperties"), rep = true),
      f(3, "int_array_properties", TMsg("IntArrayProperties"), rep = true),
      f(4, "text_array_properties", TMsg("TextArrayProperties"), rep = true),
      f(5, "boolean_array_properties", TMsg("BooleanArrayProperties"), rep = true),
      f(6, "object_properties", TMsg("ObjectProps"), rep = true),
      f(7, "object_array_properties", TMsg("ObjectArrayProps"), rep = true),
      f(10, "empty_list_props", TString, rep = true)),
    "SingleTargetRefProps" -> Map(
      f(1, "uuids", TString, rep = true), f(2, "prop_name", TString)),
    "MultiTargetRefProps" -> Map(
      f(1, "uuids", TString, rep = true), f(2, "prop_name", TString),
      f(3, "target_collection", TString)),
    "NumberArrayProperties" -> Map(
      f(1, "values", TDouble, rep = true), f(2, "prop_name", TString),
      f(3, "values_bytes", TBytes)),
    "IntArrayProperties" -> Map(
      f(1, "values", TInt64, rep = true), f(2, "prop_name", TString)),
    "TextArrayProperties" -> Map(
      f(1, "values", TString, rep = true), f(2, "prop_name", TString)),
    "BooleanArrayProperties" -> Map(
      f(1, "values", TBool, rep = true), f(2, "prop_name", TString)),

    // ----- SearchReply (grpc/proto/v1/search_get.proto, reply side) -------
    "SearchReply" -> Map(
      f(1, "took", TFloat),
      f(2, "results", TMsg("SearchResult"), rep = true),
      f(4, "group_by_results", TMsg("GroupByResult"), rep = true)),
    "GroupByResult" -> Map(
      f(1, "name", TString), f(2, "min_distance", TFloat),
      f(3, "max_distance", TFloat), f(4, "number_of_objects", TInt64),
      f(5, "objects", TMsg("SearchResult"), rep = true)),
    "SearchResult" -> Map(
      f(1, "properties", TMsg("PropertiesResult")),
      f(2, "metadata", TMsg("MetadataResult"))),
    "PropertiesResult" -> Map(
      f(2, "ref_props", TMsg("RefPropertiesResult"), rep = true),
      f(3, "target_collection", TString),
      f(11, "non_ref_properties", TProps), // proto name non_ref_props; the
      // engine's protojson key (nonRefProperties) normalizes to this entry
      f(12, "ref_props_requested", TBool)),
    "RefPropertiesResult" -> Map(
      f(1, "properties", TMsg("PropertiesResult"), rep = true),
      f(2, "prop_name", TString)),
    // ----- Tenants wire (grpc/proto/v1/tenants.proto) ----------------------
    "TenantsGetRequest" -> Map(
      f(1, "collection", TString), f(2, "names", TMsg("TenantNames"))),
    "TenantNames" -> Map(f(1, "values", TString, rep = true)),
    "TenantsGetReply" -> Map(
      f(1, "took", TFloat), f(2, "tenants", TMsg("TenantMsg"), rep = true)),
    "TenantMsg" -> Map(
      f(1, "name", TString), f(2, "activity_status", TEnum(Map(
        0 -> "TENANT_ACTIVITY_STATUS_UNSPECIFIED",
        1 -> "TENANT_ACTIVITY_STATUS_HOT", 2 -> "TENANT_ACTIVITY_STATUS_COLD",
        4 -> "TENANT_ACTIVITY_STATUS_FROZEN",
        5 -> "TENANT_ACTIVITY_STATUS_UNFREEZING",
        6 -> "TENANT_ACTIVITY_STATUS_FREEZING",
        7 -> "TENANT_ACTIVITY_STATUS_ACTIVE",
        8 -> "TENANT_ACTIVITY_STATUS_INACTIVE",
        9 -> "TENANT_ACTIVITY_STATUS_OFFLOADED",
        10 -> "TENANT_ACTIVITY_STATUS_OFFLOADING",
        11 -> "TENANT_ACTIVITY_STATUS_ONLOADING")))),
    // PhoneNumber (properties.proto:88-96) — surfaces inside typed Values
    "PhoneNumberMsg" -> Map(
      f(1, "country_code", TInt64), f(2, "default_country", TString),
      f(3, "input", TString), f(4, "international_formatted", TString),
      f(5, "national", TInt64), f(6, "national_formatted", TString),
      f(7, "valid", TBool)),
    "MetadataResult" -> Map(
      f(1, "id", TString),
      f(3, "creation_time_unix", TInt64), f(4, "creation_time_unix_present", TBool),
      f(5, "last_update_time_unix", TInt64), f(6, "last_update_time_unix_present", TBool),
      f(7, "distance", TFloat), f(8, "distance_present", TBool),
      f(9, "certainty", TFloat), f(10, "certainty_present", TBool),
      f(11, "score", TFloat), f(12, "score_present", TBool),
      f(13, "explain_score", TString), f(14, "explain_score_present", TBool),
      f(19, "vector_bytes", TBytes), f(20, "id_as_bytes", TBytes),
      f(23, "vectors", TMsg("Vectors"), rep = true)))

  // ==========================================================================
  // Wire reader → protojson JValue
  // ==========================================================================

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        if (pos >= end) fail("proto: truncated varint")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
        if (shift > 63) fail("proto: varint too long")
      }
      out
    }
    def fixed32(): Int = {
      if (pos + 4 > end) fail("proto: truncated fixed32")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      var v = 0L
      if (pos + 8 > end) fail("proto: truncated fixed64")
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def bytes(n: Int): Array[Byte] = {
      if (pos + n > end) fail("proto: truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n; out
    }
  }

  /** Decode `bytes` as the named message → protojson-shaped JValue
   * (snake_case field names — [[WireDecoder]]'s field access normalizes
   * case; enums as their NAME strings; bytes base64; int64 as JLong). */
  def read(bytes: Array[Byte], message: String): JValue =
    readMsg(new Reader(bytes, 0, bytes.length), message)

  private def scalarOf(tpe: FType, r: Reader, wireType: Int): JValue = tpe match {
    case TString => JString(new String(r.bytes(r.varint().toInt), "UTF-8"))
    case TBytes => JString(java.util.Base64.getEncoder.encodeToString(r.bytes(r.varint().toInt)))
    case TBool => JBool(r.varint() != 0L)
    case TInt32 | TInt64 => JLong(r.varint())
    case TDouble => JDouble(java.lang.Double.longBitsToDouble(r.fixed64()))
    case TFloat => JDouble(java.lang.Float.intBitsToFloat(r.fixed32()).toDouble)
    case TEnum(values) =>
      val n = r.varint().toInt
      JString(values.getOrElse(n, n.toString))
    case other => fail(s"proto: $other is not a scalar")
  }

  /** Wire type a scalar field uses when NOT packed. */
  private def wireTypeOf(tpe: FType): Int = tpe match {
    case TString | TBytes | TMsg(_) | TMap(_) | TStruct | TProps => 2
    case TDouble => 1
    case TFloat => 5
    case _ => 0 // varint family
  }

  private def readMsg(r: Reader, message: String): JValue = {
    val spec = messages.getOrElse(message, fail(s"proto: unknown message $message"))
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, JValue]
    while (r.hasMore) {
      val tag = r.varint()
      val fieldNo = (tag >> 3).toInt
      val wt = (tag & 0x7).toInt
      spec.get(fieldNo) match {
        case None =>
          // unknown fields skip per wire type (forward compatibility)
          wt match {
            case 0 => r.varint()
            case 1 => r.fixed64()
            case 2 => r.bytes(r.varint().toInt)
            case 5 => r.fixed32()
            case other => fail(s"proto: unsupported wire type $other for unknown field $fieldNo")
          }
        case Some(fs) =>
          def append(v: JValue): Unit =
            if (fs.repeated) acc(fs.name) = acc.get(fs.name) match {
              case Some(JArray(xs)) => JArray(xs :+ v)
              case _ => JArray(List(v))
            } else acc(fs.name) = v
          fs.tpe match {
            case TMsg(child) =>
              if (wt != 2) fail(s"proto: message field ${fs.name} needs wire type 2, got $wt")
              val body = r.bytes(r.varint().toInt)
              append(readMsg(new Reader(body, 0, body.length), child))
            case TStruct =>
              if (wt != 2) fail(s"proto: struct field ${fs.name} needs wire type 2, got $wt")
              append(readStruct(r.bytes(r.varint().toInt)))
            case TProps =>
              if (wt != 2) fail(s"proto: props field ${fs.name} needs wire type 2, got $wt")
              append(readProps(r.bytes(r.varint().toInt)))
            case TMap(valueType) =>
              if (wt != 2) fail(s"proto: map field ${fs.name} needs wire type 2, got $wt")
              val body = r.bytes(r.varint().toInt)
              val er = new Reader(body, 0, body.length)
              var key = ""; var value: JValue = JNull
              while (er.hasMore) {
                val etag = er.varint()
                (etag >> 3).toInt match {
                  case 1 => key = new String(er.bytes(er.varint().toInt), "UTF-8")
                  case 2 => value = scalarOf(valueType, er, (etag & 7).toInt)
                  case _ => fail("proto: bad map entry")
                }
              }
              acc(fs.name) = acc.get(fs.name) match {
                case Some(JObject(kvs)) => JObject(kvs :+ (key -> value))
                case _ => JObject(List(key -> value))
              }
            case scalar if fs.repeated && wt == 2 && wireTypeOf(scalar) != 2 =>
              // packed repeated scalars (proto3 default)
              val body = r.bytes(r.varint().toInt)
              val pr = new Reader(body, 0, body.length)
              while (pr.hasMore) append(scalarOf(scalar, pr, wireTypeOf(scalar)))
            case scalar =>
              append(scalarOf(scalar, r, wt))
          }
      }
    }
    JObject(acc.toList)
  }

  // ==========================================================================
  // google.protobuf.Struct — protojson = the plain JSON value
  // (Struct {1: map<string, Value>}; Value oneof: 1 null_value, 2
  // number_value, 3 string_value, 4 bool_value, 5 struct_value, 6 list_value;
  // ListValue {1: repeated Value})
  // ==========================================================================

  private def readStruct(body: Array[Byte]): JValue = {
    val r = new Reader(body, 0, body.length)
    val acc = scala.collection.mutable.ListBuffer.empty[(String, JValue)]
    while (r.hasMore) {
      val tag = r.varint()
      if ((tag >> 3).toInt != 1 || (tag & 7) != 2) fail("proto: bad Struct field")
      val entry = r.bytes(r.varint().toInt)
      val er = new Reader(entry, 0, entry.length)
      var key = ""; var value: JValue = JNull
      while (er.hasMore) {
        val etag = er.varint()
        (etag >> 3).toInt match {
          case 1 => key = new String(er.bytes(er.varint().toInt), "UTF-8")
          case 2 => value = readStructValue(er.bytes(er.varint().toInt))
          case _ => fail("proto: bad Struct entry")
        }
      }
      acc += key -> value
    }
    JObject(acc.toList)
  }

  private def readStructValue(body: Array[Byte]): JValue = {
    val r = new Reader(body, 0, body.length)
    var out: JValue = JNull
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt: @unchecked) match {
        case 1 => r.varint(); out = JNull
        case 2 => out = JDouble(java.lang.Double.longBitsToDouble(r.fixed64()))
        case 3 => out = JString(new String(r.bytes(r.varint().toInt), "UTF-8"))
        case 4 => out = JBool(r.varint() != 0L)
        case 5 => out = readStruct(r.bytes(r.varint().toInt))
        case 6 =>
          val lb = r.bytes(r.varint().toInt)
          val rr = new Reader(lb, 0, lb.length)
          val items = scala.collection.mutable.ListBuffer.empty[JValue]
          while (rr.hasMore) {
            val ltag = rr.varint()
            if ((ltag >> 3).toInt != 1 || (ltag & 7) != 2) fail("proto: bad ListValue")
            items += readStructValue(rr.bytes(rr.varint().toInt))
          }
          out = JArray(items.toList)
      }
    }
    out
  }

  // ==========================================================================
  // weaviate Properties (grpc/proto/v1/properties.proto) — the engine-typed
  // Value oneof. protojson side = plain JSON; the byte side types each kind:
  // 1 number_value f64, 3 bool_value, 4 object_value(Properties),
  // 5 list_value(ListValue oneof: 2 number_values BYTES-f64LE, 3 bool_values,
  // 4 object_values, 5 date_values, 6 uuid_values, 7 int_values BYTES-i64LE,
  // 8 text_values), 6 date_value, 7 uuid_value, 8 int_value varint,
  // 9 geo_value, 10 blob_value, 11 phone_value, 12 null_value, 13 text_value.
  // JSON string kinds (text/date/uuid/blob) all surface as JString — the
  // writer types from the runtime JSON shape (strings → text_value), which
  // round-trips through this reader byte-stably.
  // ==========================================================================

  private def readProps(body: Array[Byte]): JValue = {
    val r = new Reader(body, 0, body.length)
    val acc = scala.collection.mutable.ListBuffer.empty[(String, JValue)]
    while (r.hasMore) {
      val tag = r.varint()
      if ((tag >> 3).toInt != 1 || (tag & 7) != 2) fail("proto: bad Properties field")
      val entry = r.bytes(r.varint().toInt)
      val er = new Reader(entry, 0, entry.length)
      var key = ""; var value: JValue = JNull
      while (er.hasMore) {
        val etag = er.varint()
        (etag >> 3).toInt match {
          case 1 => key = new String(er.bytes(er.varint().toInt), "UTF-8")
          case 2 => value = readPropValue(er.bytes(er.varint().toInt))
          case _ => fail("proto: bad Properties entry")
        }
      }
      acc += key -> value
    }
    JObject(acc.toList)
  }

  private def longsLE(b: Array[Byte]): Seq[Long] = {
    require(b.length % 8 == 0, "proto: 8-byte-aligned values expected")
    (0 until b.length / 8).map { i =>
      var v = 0L; var j = 0
      while (j < 8) { v |= (b(i * 8 + j) & 0xffL) << (8 * j); j += 1 }
      v
    }
  }

  private def readPropValue(body: Array[Byte]): JValue = {
    val r = new Reader(body, 0, body.length)
    var out: JValue = JNull
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt: @unchecked) match {
        case 1 => out = JDouble(java.lang.Double.longBitsToDouble(r.fixed64()))
        case 3 => out = JBool(r.varint() != 0L)
        case 4 => out = readProps(r.bytes(r.varint().toInt))
        case 5 =>
          val lb = r.bytes(r.varint().toInt)
          val lr = new Reader(lb, 0, lb.length)
          var arr: JValue = JArray(Nil)
          while (lr.hasMore) {
            val ltag = lr.varint()
            val lbody = lr.bytes(lr.varint().toInt)
            ((ltag >> 3).toInt: @unchecked) match {
              case 2 => // number_values: f64 LE bytes
                val vb = readSingleBytes(lbody, "NumberValues")
                arr = JArray(longsLE(vb).map(l =>
                  JDouble(java.lang.Double.longBitsToDouble(l))).toList)
              case 3 => arr = JArray(readRepeatedVarints(lbody).map(v => JBool(v != 0L)).toList)
              case 4 => // object_values {1: repeated Properties}
                val vr = new Reader(lbody, 0, lbody.length)
                val items = scala.collection.mutable.ListBuffer.empty[JValue]
                while (vr.hasMore) {
                  val vtag = vr.varint()
                  if ((vtag >> 3).toInt != 1) fail("proto: bad ObjectValues")
                  items += readProps(vr.bytes(vr.varint().toInt))
                }
                arr = JArray(items.toList)
              case 5 | 6 | 8 => // date/uuid/text_values {1: repeated string}
                arr = JArray(readRepeatedStrings(lbody).map(JString(_)).toList)
              case 7 => // int_values: i64 LE bytes
                val vb = readSingleBytes(lbody, "IntValues")
                arr = JArray(longsLE(vb).map(JLong(_)).toList)
            }
          }
          out = arr
        case 6 | 7 | 10 | 13 =>
          out = JString(new String(r.bytes(r.varint().toInt), "UTF-8"))
        case 8 => out = JLong(r.varint())
        case 9 =>
          val gb = r.bytes(r.varint().toInt)
          val gr = new Reader(gb, 0, gb.length)
          var lon = 0.0; var lat = 0.0
          while (gr.hasMore) {
            val gtag = gr.varint()
            ((gtag >> 3).toInt: @unchecked) match {
              case 1 => lon = java.lang.Float.intBitsToFloat(gr.fixed32()).toDouble
              case 2 => lat = java.lang.Float.intBitsToFloat(gr.fixed32()).toDouble
            }
          }
          out = JObject(List("latitude" -> JDouble(lat), "longitude" -> JDouble(lon)))
        case 11 =>
          val pb = r.bytes(r.varint().toInt)
          out = readMsg(new Reader(pb, 0, pb.length), "PhoneNumberMsg")
        case 12 => r.varint(); out = JNull
      }
    }
    out
  }

  private def readSingleBytes(body: Array[Byte], what: String): Array[Byte] = {
    val r = new Reader(body, 0, body.length)
    var out = Array.empty[Byte]
    while (r.hasMore) {
      val tag = r.varint()
      if ((tag >> 3).toInt != 1) fail(s"proto: bad $what")
      out = r.bytes(r.varint().toInt)
    }
    out
  }
  private def readRepeatedStrings(body: Array[Byte]): Seq[String] = {
    val r = new Reader(body, 0, body.length)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (r.hasMore) {
      val tag = r.varint()
      if ((tag >> 3).toInt != 1) fail("proto: bad string list")
      out += new String(r.bytes(r.varint().toInt), "UTF-8")
    }
    out.toSeq
  }
  private def readRepeatedVarints(body: Array[Byte]): Seq[Long] = {
    val r = new Reader(body, 0, body.length)
    val out = scala.collection.mutable.ListBuffer.empty[Long]
    while (r.hasMore) {
      val tag = r.varint()
      if ((tag & 7) == 2) { // packed
        val pb = r.bytes(r.varint().toInt)
        val pr = new Reader(pb, 0, pb.length)
        while (pr.hasMore) out += pr.varint()
      } else out += r.varint()
    }
    out.toSeq
  }

  // ==========================================================================
  // Wire writer (fixture author + round-trip proof) — same descriptors
  // ==========================================================================

  def write(jv: JValue, message: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeMsg(out, jv, message)
    out.toByteArray
  }

  private def putVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def putTag(out: java.io.ByteArrayOutputStream, fieldNo: Int, wt: Int): Unit =
    putVarint(out, (fieldNo.toLong << 3) | wt)

  private def scalarBytes(tpe: FType, v: JValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    tpe match {
      case TBool => putVarint(out, if (v == JBool(true)) 1 else 0)
      case TInt32 | TInt64 => putVarint(out, v match {
        case JInt(i) => i.toLong; case JLong(l) => l
        case JDouble(d) => d.toLong
        case JString(s) => s.toLong // protojson renders int64 as a string
        case o => fail(s"proto write: expected int, got $o")
      })
      case TDouble =>
        val bits = java.lang.Double.doubleToLongBits(v match {
          case JDouble(d) => d; case JInt(i) => i.toDouble; case JLong(l) => l.toDouble
          case o => fail(s"proto write: expected double, got $o")
        })
        var i = 0; while (i < 8) { out.write(((bits >> (8 * i)) & 0xff).toInt); i += 1 }
      case TFloat =>
        val bits = java.lang.Float.floatToIntBits((v match {
          case JDouble(d) => d; case JInt(i) => i.toDouble; case JLong(l) => l.toDouble
          case o => fail(s"proto write: expected float, got $o")
        }).toFloat)
        var i = 0; while (i < 4) { out.write((bits >> (8 * i)) & 0xff); i += 1 }
      case TEnum(values) =>
        val JString(name) = v: @unchecked
        val n = values.collectFirst { case (k, `name`) => k }.getOrElse(
          fail(s"proto write: unknown enum value $name"))
        putVarint(out, n.toLong)
      case other => fail(s"proto write: $other is not a varint/fixed scalar")
    }
    out.toByteArray
  }

  /** protojson camelCase form of a snake_case proto field name. */
  private def camelName(s: String): String = {
    val parts = s.split('_')
    parts.head + parts.tail.map(p =>
      if (p.isEmpty) p else p.head.toUpper + p.tail).mkString
  }

  private def writeMsg(out: java.io.ByteArrayOutputStream, jv: JValue, message: String): Unit = {
    val spec = messages.getOrElse(message, fail(s"proto write: unknown message $message"))
    // accept both the proto name and its protojson camelCase rendition —
    // the engine's reply JSON keys are camelCase (WireEncoder)
    val byName = spec.flatMap { case (n, fs) =>
      Seq(fs.name -> ((n, fs)), camelName(fs.name) -> ((n, fs))) }
    val JObject(fields) = jv: @unchecked
    fields.foreach { case (name, value) =>
      if (value != JNull) {
        val (no, fs) = byName.getOrElse(name, fail(s"proto write: unknown field $name in $message"))
        def one(v: JValue): Unit = fs.tpe match {
          case TMsg(child) =>
            val body = new java.io.ByteArrayOutputStream()
            writeMsg(body, v, child)
            putTag(out, no, 2); putVarint(out, body.size().toLong); body.writeTo(out)
          case TString =>
            val JString(s) = v: @unchecked
            val b = s.getBytes("UTF-8")
            putTag(out, no, 2); putVarint(out, b.length.toLong); out.write(b)
          case TBytes =>
            val JString(s) = v: @unchecked
            val b = java.util.Base64.getDecoder.decode(s)
            putTag(out, no, 2); putVarint(out, b.length.toLong); out.write(b)
          case TStruct =>
            val body = writeStruct(v)
            putTag(out, no, 2); putVarint(out, body.length.toLong); out.write(body)
          case TProps =>
            val body = writeProps(v)
            putTag(out, no, 2); putVarint(out, body.length.toLong); out.write(body)
          case TMap(valueType) => fail("proto write: use an object for map fields")
          case scalar =>
            putTag(out, no, wireTypeOf(scalar)); out.write(scalarBytes(scalar, v))
        }
        (fs.tpe, value) match {
          case (TMap(valueType), JObject(kvs)) =>
            kvs.foreach { case (k, v) =>
              val body = new java.io.ByteArrayOutputStream()
              putTag(body, 1, 2)
              val kb = k.getBytes("UTF-8")
              putVarint(body, kb.length.toLong); body.write(kb)
              valueType match {
                case TBytes =>
                  val JString(s) = v: @unchecked
                  val b = java.util.Base64.getDecoder.decode(s)
                  putTag(body, 2, 2); putVarint(body, b.length.toLong); body.write(b)
                case other =>
                  putTag(body, 2, wireTypeOf(other)); body.write(scalarBytes(other, v))
              }
              putTag(out, no, 2); putVarint(out, body.size().toLong); body.writeTo(out)
            }
          case (_, JArray(xs)) if fs.repeated =>
            fs.tpe match {
              case TString | TBytes | TMsg(_) => xs.foreach(one)
              case scalar =>
                // packed (proto3 default for repeated numeric scalars)
                val body = new java.io.ByteArrayOutputStream()
                xs.foreach(v => body.write(scalarBytes(scalar, v)))
                putTag(out, no, 2); putVarint(out, body.size().toLong); body.writeTo(out)
            }
          case _ => one(value)
        }
      }
    }
  }

  // ==========================================================================
  // Struct / Properties writers (inverse of readStruct/readProps)
  // ==========================================================================

  private def lenDelim(out: java.io.ByteArrayOutputStream, no: Int,
                       body: Array[Byte]): Unit = {
    putTag(out, no, 2); putVarint(out, body.length.toLong); out.write(body)
  }

  private def writeStruct(jv: JValue): Array[Byte] = {
    val JObject(fields) = jv: @unchecked
    val out = new java.io.ByteArrayOutputStream()
    fields.foreach { case (k, v) =>
      val entry = new java.io.ByteArrayOutputStream()
      val kb = k.getBytes("UTF-8")
      putTag(entry, 1, 2); putVarint(entry, kb.length.toLong); entry.write(kb)
      lenDelim(entry, 2, writeStructValue(v))
      lenDelim(out, 1, entry.toByteArray)
    }
    out.toByteArray
  }

  private def writeStructValue(v: JValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    v match {
      case JNull => putTag(out, 1, 0); putVarint(out, 0)
      case JDouble(d) =>
        putTag(out, 2, 1)
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 0; while (i < 8) { out.write(((bits >> (8 * i)) & 0xff).toInt); i += 1 }
      case JInt(i) => return writeStructValue(JDouble(i.toDouble))
      case JLong(l) => return writeStructValue(JDouble(l.toDouble))
      case JDecimal(d) => return writeStructValue(JDouble(d.toDouble))
      case JString(s) => lenDelim(out, 3, s.getBytes("UTF-8"))
      case JBool(b) => putTag(out, 4, 0); putVarint(out, if (b) 1 else 0)
      case o: JObject => lenDelim(out, 5, writeStruct(o))
      case JArray(xs) =>
        val lv = new java.io.ByteArrayOutputStream()
        xs.foreach(x => lenDelim(lv, 1, writeStructValue(x)))
        lenDelim(out, 6, lv.toByteArray)
      case o => fail(s"proto write: Struct cannot carry $o")
    }
    out.toByteArray
  }

  private def bytesLE(ls: Seq[Long]): Array[Byte] = {
    val b = new Array[Byte](ls.length * 8)
    ls.zipWithIndex.foreach { case (l, i) =>
      var j = 0; while (j < 8) { b(i * 8 + j) = ((l >> (8 * j)) & 0xff).toByte; j += 1 }
    }
    b
  }

  /** Schema hints for the typed Properties writer: property name → its
   * declared PropType, so uuid/date values emit their OWN Value kinds
   * (uuid_value/date_value and the uuid_values/date_values list kinds) the
   * way the reference's reply does (grpc list_value_return_test.go) —
   * without a hint a JSON string can only be text_value. */
  private val propHints = new ThreadLocal[Map[String, graft.model.PropType]] {
    override def initialValue(): Map[String, graft.model.PropType] = Map.empty
  }

  private def writeProps(jv: JValue): Array[Byte] = {
    val JObject(fields) = jv: @unchecked
    val hints = propHints.get()
    val out = new java.io.ByteArrayOutputStream()
    fields.foreach { case (k, v) =>
      val entry = new java.io.ByteArrayOutputStream()
      val kb = k.getBytes("UTF-8")
      putTag(entry, 1, 2); putVarint(entry, kb.length.toLong); entry.write(kb)
      lenDelim(entry, 2, writePropValue(v, hints.get(k)))
      lenDelim(out, 1, entry.toByteArray)
    }
    out.toByteArray
  }

  /** Types a runtime JSON value into the weaviate Value oneof. JSON strings
   * carry no date/uuid tag, so every string emits text_value — byte-stable
   * through [[readProps]] (all string kinds read back as JString) — UNLESS
   * a schema hint types the property (see [[propHints]]). */
  private def writePropValue(v: JValue,
                             hint: Option[graft.model.PropType] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def f64(no: Int, d: Double): Unit = {
      putTag(out, no, 1)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 0; while (i < 8) { out.write(((bits >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    v match {
      case JNull => putTag(out, 12, 0); putVarint(out, 0)
      case JDouble(d) => f64(1, d)
      case JDecimal(d) => f64(1, d.toDouble)
      case JInt(i) => putTag(out, 8, 0); putVarint(out, i.toLong)
      case JLong(l) => putTag(out, 8, 0); putVarint(out, l)
      case JBool(b) => putTag(out, 3, 0); putVarint(out, if (b) 1 else 0)
      // schema-typed string kinds (properties.proto 6 date_value /
      // 7 uuid_value); untyped strings stay text_value (13)
      case JString(s) =>
        val kind = hint match {
          case Some(graft.model.PropType.Date) => 6
          case Some(graft.model.PropType.Uuid) => 7
          case _ => 13
        }
        lenDelim(out, kind, s.getBytes("UTF-8"))
      case o: JObject => lenDelim(out, 4, writeProps(o))
      case JArray(xs) =>
        val lv = new java.io.ByteArrayOutputStream()
        (xs, hint) match {
          // schema-typed string lists: 5 date_values / 6 uuid_values
          case (items, Some(graft.model.PropType.Arr(el)))
              if (el == graft.model.PropType.Date || el == graft.model.PropType.Uuid) &&
                items.forall(_.isInstanceOf[JString]) =>
            val sv = new java.io.ByteArrayOutputStream()
            items.foreach { case JString(s) => lenDelim(sv, 1, s.getBytes("UTF-8")); case _ => () }
            lenDelim(lv, if (el == graft.model.PropType.Date) 5 else 6, sv.toByteArray)
          case (items, _) if items.nonEmpty && items.forall(_.isInstanceOf[JString]) =>
            val tv = new java.io.ByteArrayOutputStream()
            items.foreach { case JString(s) => lenDelim(tv, 1, s.getBytes("UTF-8")); case _ => () }
            lenDelim(lv, 8, tv.toByteArray)
          case (items, _) if items.nonEmpty && items.forall(_.isInstanceOf[JBool]) =>
            val bv = new java.io.ByteArrayOutputStream()
            val packed = new java.io.ByteArrayOutputStream()
            items.foreach { case JBool(b) => putVarint(packed, if (b) 1 else 0); case _ => () }
            lenDelim(bv, 1, packed.toByteArray)
            lenDelim(lv, 3, bv.toByteArray)
          case (items, _) if items.nonEmpty && items.forall(x =>
              x.isInstanceOf[JInt] || x.isInstanceOf[JLong]) =>
            val iv = new java.io.ByteArrayOutputStream()
            lenDelim(iv, 1, bytesLE(items.map {
              case JInt(i) => i.toLong; case JLong(l) => l; case _ => 0L }))
            lenDelim(lv, 7, iv.toByteArray)
          case (items, _) if items.nonEmpty && items.forall(_.isInstanceOf[JObject]) =>
            val ov = new java.io.ByteArrayOutputStream()
            items.foreach(o => lenDelim(ov, 1, writeProps(o)))
            lenDelim(lv, 4, ov.toByteArray)
          case (items, _) => // numeric (possibly mixed) and EMPTY lists → number_values
            val nv = new java.io.ByteArrayOutputStream()
            lenDelim(nv, 1, bytesLE(items.map {
              case JDouble(d) => java.lang.Double.doubleToLongBits(d)
              case JDecimal(d) => java.lang.Double.doubleToLongBits(d.toDouble)
              case JInt(i) => java.lang.Double.doubleToLongBits(i.toDouble)
              case JLong(l) => java.lang.Double.doubleToLongBits(l.toDouble)
              case o => fail(s"proto write: list value cannot carry $o")
            }))
            lenDelim(lv, 2, nv.toByteArray)
        }
        lenDelim(out, 5, lv.toByteArray)
      case o => fail(s"proto write: Properties cannot carry $o")
    }
    out.toByteArray
  }

  // ==========================================================================
  // Entry points — byte-transport twins of the protojson decoders/encoders
  // ==========================================================================

  /** Decode a binary `SearchRequest` into GetParams — the byte-transport
   * twin of [[WireDecoder.search]]. */
  def searchRequest(g: Graft, bytes: Array[Byte]): GetParams =
    WireDecoder.decodeSearch(g, read(bytes, "SearchRequest"))

  /** Decode a binary `AggregateRequest` — twin of [[WireDecoder.aggregate]]
   * (grpc/proto/v1/aggregate.proto; the Aggregation oneof arms, the group_by
   * message and the search oneof reuse the SAME protojson decode path). */
  def aggregateRequest(g: Graft, bytes: Array[Byte]): graft.model.AggregateParams =
    WireDecoder.decodeAggregate(g, read(bytes, "AggregateRequest"))

  /** Decode a binary `BatchObjectsRequest` — twin of
   * [[WireDecoder.decodeBatchObjects]]: same per-index partial-batch error
   * contract; the google.protobuf.Struct non_ref_properties payload routes
   * through the generic Struct reader. */
  def batchObjectsRequest(bytes: Array[Byte])
      : (Seq[(Int, WireDecoder.BatchObject)], Map[Int, String]) = {
    import org.json4s.jackson.JsonMethods
    WireDecoder.decodeBatchObjects(
      JsonMethods.compact(JsonMethods.render(read(bytes, "BatchObjectsRequest"))))
  }

  /** Encode the engine's protojson `SearchReply` (WireEncoder.searchReply
   * output) as proto bytes — the reply direction of the gRPC round-trip.
   * Property values type from their runtime JSON shape (properties.proto
   * Value oneof; strings → text_value). */
  def searchReplyBytes(replyJson: String): Array[Byte] = {
    import org.json4s.jackson.JsonMethods
    write(JsonMethods.parse(replyJson), "SearchReply")
  }

  /** [[searchReplyBytes]] with SCHEMA HINTS: per-property declared types
   * drive the Value oneof kinds — uuid/date strings (and their lists) emit
   * uuid_value/date_value/uuid_values/date_values instead of text kinds,
   * exactly what a typed gRPC client decodes
   * (grpc list_value_return_test.go). */
  def searchReplyBytes(replyJson: String,
                       propTypes: Map[String, graft.model.PropType]): Array[Byte] = {
    import org.json4s.jackson.JsonMethods
    propHints.set(propTypes)
    try write(JsonMethods.parse(replyJson), "SearchReply")
    finally propHints.remove()
  }

  /** Binary TenantsGet (grpc tenants_test.go): decode the request, answer
   * from the tenant registry, encode the TenantsGetReply bytes. The names
   * oneof set but EMPTY is the suite's error contract; unknown names
   * return an empty list. HOT/COLD render for Active/Inactive (tenant.proto
   * keeps both spellings; the reference replies the legacy pair). */
  def tenantsGet(g: Graft, bytes: Array[Byte]): Array[Byte] = {
    val jv = read(bytes, "TenantsGetRequest")
    val collection = (jv \ "collection") match {
      case JString(c) => c; case _ => fail("tenants get: collection is required")
    }
    val names: Option[Seq[String]] = (jv \ "names") match {
      case JNothing | JNull => None
      case n => Some((n \ "values") match {
        case JArray(xs) => xs.map { case JString(s) => s; case o => fail(s"bad name $o") }
        case _ => Nil
      })
    }
    names.filter(_.isEmpty).foreach(_ =>
      fail("tenant names must not be empty when the names parameter is set"))
    val all = g.tenants(collection)
    val selected = names match {
      case Some(ns) => ns.flatMap(n => all.find(_.name == n))
      case None => all
    }
    val statusName: graft.model.TenantStatus => String = {
      case graft.model.TenantStatus.Active => "TENANT_ACTIVITY_STATUS_HOT"
      case graft.model.TenantStatus.Inactive => "TENANT_ACTIVITY_STATUS_COLD"
      case graft.model.TenantStatus.Offloaded => "TENANT_ACTIVITY_STATUS_FROZEN"
    }
    write(JObject(List(
      "tenants" -> JArray(selected.toList.map(t => JObject(List(
        "name" -> JString(t.name),
        "activity_status" -> JString(statusName(t.activityStatus)))))))),
      "TenantsGetReply")
  }

  private val ValueKindNames = Map(
    1 -> "number_value", 3 -> "bool_value", 4 -> "object_value",
    5 -> "list_value", 6 -> "date_value", 7 -> "uuid_value", 8 -> "int_value",
    9 -> "geo_value", 10 -> "blob_value", 11 -> "phone_value",
    12 -> "null_value", 13 -> "text_value")
  private val ListKindNames = Map(
    2 -> "number_values", 3 -> "bool_values", 4 -> "object_values",
    5 -> "date_values", 6 -> "uuid_values", 7 -> "int_values", 8 -> "text_values")

  /** Wire-contract verifier: walk a SearchReply's FIRST result's
   * non_ref_props BYTES (never the collapsing json view) and report each
   * property's RAW Value oneof kind — list values as "list:<kind>". The
   * grpc acceptance suite's typed-list assertions are exactly these tags. */
  def propertyKinds(replyBytes: Array[Byte]): Map[String, String] = {
    def sub(r: Reader, wantField: Int): Option[Array[Byte]] = {
      while (r.hasMore) {
        val tag = r.varint()
        val no = (tag >> 3).toInt
        (tag & 7) match {
          case 0 => r.varint()
          case 1 => r.fixed64()
          case 5 => r.fixed32()
          case 2 =>
            val b = r.bytes(r.varint().toInt)
            if (no == wantField) return Some(b)
          case other => fail(s"proto: unsupported wire type $other")
        }
      }
      None
    }
    def rd(b: Array[Byte]) = new Reader(b, 0, b.length)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for {
      result <- sub(rd(replyBytes), 2)          // SearchReply.results[0]
      props <- sub(rd(result), 1)               // SearchResult.properties
      nonRef <- sub(rd(props), 11)              // PropertiesResult.non_ref_props
    } {
      val pr = rd(nonRef)
      while (pr.hasMore) {
        val tag = pr.varint()
        if ((tag >> 3).toInt != 1 || (tag & 7) != 2) fail("proto: bad Properties field")
        val entry = pr.bytes(pr.varint().toInt)
        val er = rd(entry)
        var key = ""; var kind = "?"
        while (er.hasMore) {
          val etag = er.varint()
          (etag >> 3).toInt match {
            case 1 => key = new String(er.bytes(er.varint().toInt), "UTF-8")
            case 2 =>
              val vb = er.bytes(er.varint().toInt)
              val vr = rd(vb)
              if (vr.hasMore) {
                val vtag = vr.varint()
                val vno = (vtag >> 3).toInt
                kind = ValueKindNames.getOrElse(vno, vno.toString)
                if (vno == 5) { // list_value: name the inner list kind
                  val lb = vr.bytes(vr.varint().toInt)
                  val lr = rd(lb)
                  if (lr.hasMore) {
                    val lno = (lr.varint() >> 3).toInt
                    kind = s"list:${ListKindNames.getOrElse(lno, lno.toString)}"
                  }
                } else (vtag & 7) match {
                  case 0 => vr.varint(); case 1 => vr.fixed64()
                  case 5 => vr.fixed32(); case _ => ()
                }
              }
            case _ => fail("proto: bad Properties entry")
          }
        }
        out += key -> kind
      }
    }
    out.toMap
  }
}
