package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.engine.WireDecoder.WireError
import graft.model._

/**
 * Schema wire decoder — parses a weaviate `models.Class` JSON document
 * (the body of `POST /v1/schema`) into the engine's [[CollectionSchema]],
 * replaying the reference's creation-time normalization, migration, and
 * validation verbatim. After the three query wire shapes (gRPC JSON,
 * REST where tree, GraphQL documents) and the batch-objects write shape,
 * this closes the last migration surface: a user brings their class
 * definitions unchanged.
 *
 * Reference:
 *  - usecases/schema/class.go AddClass:115-180 (UppercaseClassName +
 *    LowercaseAllPropertyNames normalization BEFORE validation,
 *    validateCanAddClass), 949-976 (string/string[] → text/text[] +
 *    word→whitespace tokenization migration, bug-compatible), 1006-1062
 *    (validateProperty: name regex, reserved names, case-insensitive
 *    duplicate check, dataType resolution wrap, tokenization and
 *    indexSearchable rules), 1213-1267 (validatePropertyTokenization)
 *  - entities/schema/validation.go (class `[A-Z][_0-9A-Za-z]{0,254}`,
 *    property `[_A-Za-z][_0-9A-Za-z]{0,230}`, reserved {_additional,_id,id},
 *    internal-index suffix blocklist)
 *  - entities/schema/data_types.go:232-300 (primitive/nested/ref dataType
 *    resolution and its error texts)
 *  - adapters/repos/db/shard_init_vector.go:60-76 (distance metric names,
 *    including the reference's missing-space quirk in the error text)
 *  - adapters/repos/db/inverted/stopwords/detector.go:52 (preset check)
 *
 * Engine-binding parameters the wire cannot carry: weaviate objects have an
 * implicit uuid primary key and tenancy is a shard property — this engine
 * binds both to DataFrame columns, so the caller supplies `idColumn` (and
 * `tenantColumn` when multiTenancyConfig.enabled). Vector names bind to
 * same-named columns unless `vectorColumns` overrides.
 */
object SchemaWire {

  private def fail(msg: String): Nothing = throw new WireError(msg)

  private def str(jv: JValue, name: String): Option[String] = jv \ name match {
    case JString(s) => Some(s)
    case JNothing | JNull => None
    case o => fail(s"$name: expected a string, got ${JsonMethods.compact(JsonMethods.render(o))}")
  }
  private def obj(jv: JValue, name: String): Option[JValue] = jv \ name match {
    case o: JObject => Some(o)
    case JNothing | JNull => None
    case o => fail(s"$name: expected an object, got ${JsonMethods.compact(JsonMethods.render(o))}")
  }
  private def boolOpt(jv: JValue, name: String): Option[Boolean] = jv \ name match {
    case JBool(b) => Some(b)
    case JNothing | JNull => None
    case o => fail(s"$name: expected a boolean, got ${JsonMethods.compact(JsonMethods.render(o))}")
  }
  private def strArr(jv: JValue, name: String): Seq[String] = jv \ name match {
    case JArray(xs) => xs.map {
      case JString(s) => s
      case o => fail(s"$name: expected strings, got ${JsonMethods.compact(JsonMethods.render(o))}")
    }
    case JNothing | JNull => Nil
    case o => fail(s"$name: expected a list, got ${JsonMethods.compact(JsonMethods.render(o))}")
  }

  private val ClassNameRe = "^[A-Z][_0-9A-Za-z]{0,254}$".r
  private val PropertyNameRe = "^[_A-Za-z][_0-9A-Za-z]{0,230}$".r
  private val ReservedProps = Set("_additional", "_id", "id")
  private val ReservedSuffixes = Seq(
    "_searchable", "_rangeable", "_temp", "__meta_count",
    "_propertyLength", "_nullState")

  /** schema.UppercaseClassName / LowercaseFirstLetter (schema.go:62-121). */
  private def upperFirst(s: String): String =
    if (s.isEmpty) s else s.head.toUpper + s.tail
  private def lowerFirst(s: String): String =
    if (s.isEmpty) s else s.head.toLower + s.tail

  private val Primitives: Map[String, PropType] = Map(
    "text" -> PropType.Text, "int" -> PropType.Int, "number" -> PropType.Number,
    "boolean" -> PropType.Bool, "date" -> PropType.Date, "uuid" -> PropType.Uuid,
    "geoCoordinates" -> PropType.Geo, "phoneNumber" -> PropType.Phone,
    "blob" -> PropType.Blob, "object" -> PropType.Obj,
    "text[]" -> PropType.Arr(PropType.Text), "int[]" -> PropType.Arr(PropType.Int),
    "number[]" -> PropType.Arr(PropType.Number), "boolean[]" -> PropType.Arr(PropType.Bool),
    "date[]" -> PropType.Arr(PropType.Date), "uuid[]" -> PropType.Arr(PropType.Uuid),
    "object[]" -> PropType.Arr(PropType.Obj))

  private val Tokenizations: Map[String, Tokenization] = Map(
    "word" -> Tokenization.Word, "lowercase" -> Tokenization.Lowercase,
    "whitespace" -> Tokenization.Whitespace, "field" -> Tokenization.Field,
    "trigram" -> Tokenization.Trigram, "gse" -> Tokenization.Gse,
    "gse_ch" -> Tokenization.GseCh, "kagome_ja" -> Tokenization.KagomeJa,
    "kagome_kr" -> Tokenization.KagomeKr)

  private val Distances: Map[String, Metric] = Map(
    "cosine" -> Metric.Cosine, "dot" -> Metric.Dot, "l2-squared" -> Metric.L2Squared,
    "manhattan" -> Metric.Manhattan, "hamming" -> Metric.Hamming)

  def decodeClass(json: String,
                  idColumn: String,
                  tenantColumn: Option[String] = None,
                  vectorColumns: Map[String, String] = Map.empty,
                  knownClasses: Set[String] = Set.empty): CollectionSchema = {
    val jv = JsonMethods.parse(json)

    // normalization BEFORE validation (AddClass:118-119)
    val rawName = str(jv, "class").getOrElse("")
    val className = upperFirst(rawName)

    // legacy class-level vector index + named vectors is forbidden
    // (validateCanAddClass:1102-1104)
    val legacyVector = obj(jv, "vectorIndexConfig").isDefined ||
      str(jv, "vectorIndexType").isDefined ||
      str(jv, "vectorizer").exists(_ != "none")
    val namedVectors: Seq[(String, JValue)] = obj(jv, "vectorConfig") match {
      case Some(JObject(fields)) => fields.map { case (n, v) => (n, v) }
      case _ => Nil
    }
    if (legacyVector && namedVectors.nonEmpty)
      fail("creating a class with both a class level vector index and named vectors is forbidden")

    if (!ClassNameRe.matches(className))
      fail(s"'$className' is not a valid class name")

    // inverted index config
    val iic = obj(jv, "invertedIndexConfig")
    val inverted = InvertedIndexConfig(
      indexTimestamps = iic.exists(c => boolOpt(c, "indexTimestamps").getOrElse(false)),
      indexNullState = iic.exists(c => boolOpt(c, "indexNullState").getOrElse(false)),
      indexPropertyLength = iic.exists(c => boolOpt(c, "indexPropertyLength").getOrElse(false)))
    val stopwords = iic.flatMap(obj(_, "stopwords")) match {
      case Some(sw) =>
        val preset = str(sw, "preset").getOrElse("en")
        if (preset != "en" && preset != "none")
          fail(s"""preset "$preset" not known to stopword detector""")
        StopwordConfig(preset, additions = strArr(sw, "additions"),
          removals = strArr(sw, "removals"))
      case None => StopwordConfig()
    }

    // multi-tenancy needs a column binding in this engine
    val mtEnabled = obj(jv, "multiTenancyConfig")
      .exists(c => boolOpt(c, "enabled").getOrElse(false))
    if (mtEnabled && tenantColumn.isEmpty)
      fail(s"class $className: multiTenancyConfig.enabled requires a tenantColumn binding in this engine")

    // properties
    val propsJson: Seq[JValue] = jv \ "properties" match {
      case JArray(xs) => xs
      case JNothing | JNull => Nil
      case o => fail(s"properties: expected a list, got ${JsonMethods.compact(JsonMethods.render(o))}")
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val properties = propsJson.map { pj =>
      val name = lowerFirst(str(pj, "name").getOrElse("")) // LowercaseAllPropertyNames
      if (!PropertyNameRe.matches(name))
        fail(s"'$name' is not a valid property name. Property names in Weaviate " +
          s"are restricted to valid GraphQL names, which must be “/[_A-Za-z][_0-9A-Za-z]{0,230}/”")
      if (ReservedProps.contains(name)) fail(s"'$name' is a reserved property name")
      ReservedSuffixes.find(name.endsWith).foreach(sfx =>
        fail(s"'$name' is not a valid property name: suffix '$sfx' is reserved for internal indices"))
      if (!seen.add(name.toLowerCase))
        fail(s"""class "$className": conflict for property "$name": already in use or provided multiple times""")

      val dataTypeRaw = strArr(pj, "dataType")
      val (dt0, refTargetsAll) = resolveDataType(name, dataTypeRaw, className, knownClasses)
      val refTarget = refTargetsAll.headOption.filter(_ => refTargetsAll.size == 1)

      // string/string[] → text/text[] + word→whitespace migration
      // (migratePropertyDataTypeAndTokenization — bug-compatible)
      val isDeprecatedString = dataTypeRaw.headOption.exists(d => d == "string" || d == "string[]")
      val tokRaw = str(pj, "tokenization").getOrElse("")
      validateTokenization(tokRaw, dataTypeRaw.headOption.getOrElse(""), dt0, refTargetsAll.nonEmpty)
      val tok0 =
        if (tokRaw.isEmpty) Tokenization.Word
        else Tokenizations.getOrElse(tokRaw,
          fail(s"tokenization '$tokRaw' is not allowed for data type '${dataTypeRaw.head}'"))
      val tok = if (isDeprecatedString && tok0 == Tokenization.Word) Tokenization.Whitespace else tok0

      val isTextLike = dt0 == PropType.Text || dt0 == PropType.Arr(PropType.Text)
      val indexSearchable = boolOpt(pj, "indexSearchable")
      indexSearchable.foreach { s =>
        if (s && !isTextLike)
          fail("`indexSearchable` is allowed only for text/text[] data types. " +
            "For other data types set false or leave empty")
      }

      val asciiFold = obj(pj, "textAnalyzer")
        .exists(ta => boolOpt(ta, "asciiFold").getOrElse(false))

      Property(name, dt0,
        tokenization = tok,
        refTarget = refTarget,
        refTargets = if (refTargetsAll.size > 1) refTargetsAll else Nil,
        indexFilterable = boolOpt(pj, "indexFilterable").getOrElse(true),
        indexSearchable = indexSearchable.getOrElse(isTextLike),
        asciiFold = asciiFold,
        indexRangeFilters = boolOpt(pj, "indexRangeFilters").getOrElse(false))
    }

    // vector config → metrics + column bindings
    def metricOf(cfg: Option[JValue]): Metric = cfg.flatMap(str(_, "distance")) match {
      case None => Metric.Cosine // DefaultDistanceMetric (common/config.go:31)
      case Some(d) => Distances.getOrElse(d,
        // reference quirk: no space after the comma (shard_init_vector.go:74)
        fail(s"""unrecognized distance metric "$d",""" +
          """choose one of ["cosine", "dot", "l2-squared", "manhattan","hamming"]"""))
    }
    val (vectors, metrics, defaultVec) =
      if (namedVectors.nonEmpty) {
        val vs = namedVectors.map { case (n, cfg) =>
          val col = vectorColumns.getOrElse(n, n)
          (n -> col, n -> metricOf(obj(cfg, "vectorIndexConfig")))
        }
        (vs.map(_._1).toMap, vs.map(_._2).toMap, Some(namedVectors.head._1))
      } else if (legacyVector) {
        val col = vectorColumns.getOrElse("default", "default")
        (Map("default" -> col), Map("default" -> metricOf(obj(jv, "vectorIndexConfig"))),
          Some("default"))
      } else (Map.empty[String, String], Map.empty[String, Metric], None)

    CollectionSchema(
      name = className,
      idColumn = idColumn,
      properties = properties,
      vectors = vectors,
      defaultVector = defaultVec,
      tenantColumn = if (mtEnabled) tenantColumn else None,
      stopwords = stopwords,
      invertedIndex = inverted,
      vectorMetrics = metrics,
      // moduleConfig.<text2vec-*>.vectorizeClassName (class-level; any
      // text2vec module key carries it — the corpus rule is shared)
      vectorizeClassName = obj(jv, "moduleConfig").flatMap { mc =>
        mc match {
          case JObject(fields) => fields.collectFirst {
            case (k, v) if k.startsWith("text2vec") =>
              boolOpt(v, "vectorizeClassName").getOrElse(true)
          }
          case _ => None
        }
      }.getOrElse(true))
  }

  /** PUT /v1/schema/{className} — decode an update body and validate it
   * against the registered class with the reference's mutable-field rules
   * (usecases/schema/class.go:459-632 UpdateClass →
   * parser.go:275-343 ParseClassUpdate + class.go:1798-1878
   * validateImmutableFields): the class name, the three inverted-index
   * flags, multi-tenancy, the vector distance, and every property field
   * other than description are immutable; stopwords and the other
   * invertedIndexConfig knobs apply. Returns the updated schema with the
   * current class's engine-side bindings carried over. */
  def decodeClassUpdate(current: CollectionSchema, className: String, json: String,
                        knownClasses: Set[String] = Set.empty): CollectionSchema = {
    val jv = JsonMethods.parse(json)
    val bodyName = upperFirst(str(jv, "class").getOrElse(""))
    if (bodyName != className)
      fail(s"""class name is immutable: attempted change from "$className" to "$bodyName"""")

    // MT toggle (class.go:1782-1796 validateUpdatingMT)
    val mtEnabled = obj(jv, "multiTenancyConfig")
      .exists(c => boolOpt(c, "enabled").getOrElse(false))
    val curMt = current.tenantColumn.isDefined
    if (mtEnabled != curMt)
      fail(if (curMt) "disabling multi-tenancy for an existing class is not supported"
           else "enabling multi-tenancy for an existing class is not supported")

    val updated = decodeClass(json, current.idColumn, current.tenantColumn,
      current.vectors, knownClasses)

    // the three indexing flags (class.go:1859-1878; the reference's first
    // name is the SINGULAR "indexTimestamp")
    def flagCheck(name: String, cur: Boolean, upd: Boolean): Unit =
      if (cur != upd)
        fail(s""""$name" setting is immutable. Value changed from "$cur" to "$upd"""")
    flagCheck("indexTimestamp",
      current.invertedIndex.indexTimestamps, updated.invertedIndex.indexTimestamps)
    flagCheck("indexNullState",
      current.invertedIndex.indexNullState, updated.invertedIndex.indexNullState)
    flagCheck("indexPropertyLength",
      current.invertedIndex.indexPropertyLength, updated.invertedIndex.indexPropertyLength)

    // per-vector distance (hnsw/config_update.go:54 via the parser's
    // "validate vector index config" wrap, parser.go:320-327)
    updated.vectors.keys.foreach { k =>
      if (current.vectors.contains(k)) {
        val cur = current.vectorMetrics.getOrElse(k, Metric.Cosine)
        val upd = updated.vectorMetrics.getOrElse(k, Metric.Cosine)
        if (cur != upd)
          fail("validate vector index config: distance is immutable: " +
            s"""attempted change from "${cur.name}" to "${upd.name}"""")
      }
    }

    // properties: identical modulo description (parser.go:33-36,346-375 —
    // count mismatch and any non-description field diff share one text;
    // descriptions are not carried by CollectionSchema, so a
    // description-only update is inherently allowed)
    val errProps = "property fields other than description cannot be updated " +
      "through updating the class. Use the add property feature " +
      "(e.g. \"POST /v1/schema/{className}/properties\") to add additional properties"
    val curSorted = current.properties.sortBy(_.name)
    val updSorted = updated.properties.sortBy(_.name)
    if (curSorted.size != updSorted.size) fail(errProps)
    curSorted.zip(updSorted).foreach { case (a, b) => if (a != b) fail(errProps) }

    updated.copy(
      creationTimeColumn = current.creationTimeColumn,
      updateTimeColumn = current.updateTimeColumn,
      timestampUnit = current.timestampUnit)
  }

  /** POST /v1/schema/{className}/properties — decode one property document
   * through the SAME validation/normalization path a class create runs
   * (usecases/schema/class.go AddClassProperty routes into
   * validateProperty), plus the duplicate-name conflict check against the
   * registered class. */
  def decodeAddProperty(current: CollectionSchema, json: String,
                        knownClasses: Set[String] = Set.empty): Property = {
    // re-enter decodeClass with a minimal synthetic class wrapper so the
    // property gets the exact create-path normalization and error texts
    val wrapped = s"""{"class": "${current.name}", "properties": [${json.trim}]}"""
    val decoded = decodeClass(wrapped, current.idColumn, current.tenantColumn,
      knownClasses = knownClasses)
    val prop = decoded.properties.head
    if (current.properties.exists(_.name.equalsIgnoreCase(prop.name)))
      fail(s"""class "${current.name}": conflict for property "${prop.name}": """ +
        "already in use or provided multiple times")
    prop
  }

  /** FindPropertyDataTypeWithRefsAndAuth (data_types.go:243-300) with the
   * validateProperty wrap (class.go:1024-1028). */
  private def resolveDataType(propName: String, dataType: Seq[String],
                              owningClass: String, knownClasses: Set[String])
      : (PropType, Seq[String]) = {
    def wrap(inner: String): Nothing =
      fail(s"property '$propName': invalid dataType: ${dataType.mkString("[", " ", "]")}: $inner")
    if (dataType.isEmpty) wrap("dataType must have at least one element")
    if (dataType.size == 1) {
      val d = dataType.head
      Primitives.get(d).foreach(pt => return (pt, Nil))
      if (d == "string") return (PropType.Text, Nil)
      if (d == "string[]") return (PropType.Arr(PropType.Text), Nil)
      if (d.isEmpty) wrap("dataType cannot be an empty string")
      // a single NON-capitalized unknown name is not a ref (IsRefDataType
      // checks the leading uppercase letter)
      if (!d.head.isUpper) wrap(s"unknown primitive data type '$d'")
      // self-reference is allowed without existence (data_types.go:286)
      if (d != owningClass && knownClasses.nonEmpty && !knownClasses.contains(d))
        wrap("reference property to nonexistent class")
      (PropType.Ref, Seq(d))
    } else {
      // multi-class cref (MultipleRef): every entry must be a class name —
      // a primitive mixed into the list fails like the reference
      // (data_types.go:243-300 walks each entry through the ref branch)
      dataType.foreach { d =>
        if (d.isEmpty) wrap("dataType cannot be an empty string")
        if (!d.head.isUpper) wrap(s"unknown primitive data type '$d'")
        if (d != owningClass && knownClasses.nonEmpty && !knownClasses.contains(d))
          wrap("reference property to nonexistent class")
      }
      (PropType.Ref, dataType)
    }
  }

  /** validatePropertyTokenization (class.go:1213-1267) on the RAW dataType
   * (validation runs before the string→text migration). */
  private def validateTokenization(tok: String, rawType: String,
                                   dt: PropType, isRef: Boolean): Unit = {
    if (isRef) {
      if (tok.nonEmpty) fail("tokenization is not allowed for reference data type")
      return
    }
    if (tok.isEmpty) return
    rawType match {
      case "string" | "string[]" =>
        if (tok != "word" && tok != "field")
          fail(s"tokenization '$tok' is not allowed for data type '$rawType'")
      case "text" | "text[]" =>
        if (!Tokenizations.contains(tok))
          fail(s"tokenization '$tok' is not allowed for data type '$rawType'")
        // CJK segmenters are env-gated exactly like the reference's
        // ENABLE_TOKENIZER_* flags (class.go:1230-1249)
        val gates = Map(
          "gse" -> "ENABLE_TOKENIZER_GSE", "gse_ch" -> "ENABLE_TOKENIZER_GSE_CH",
          "kagome_ja" -> "ENABLE_TOKENIZER_KAGOME_JA", "kagome_kr" -> "ENABLE_TOKENIZER_KAGOME_KR")
        gates.get(tok).foreach { env =>
          def on(e: String) = sys.env.get(e).exists(v => v == "true" || v == "enabled" || v == "on")
          // gse also honors the legacy USE_GSE switch (class.go:1231)
          val enabled = on(env) || (tok == "gse" && on("USE_GSE"))
          if (!enabled) {
            val lang = tok match {
              case "gse" => "GSE"; case "gse_ch" => "Chinese"
              case "kagome_ja" => "Japanese"; case "kagome_kr" => "Korean"
            }
            val article = if (tok == "gse") "the GSE tokenizer" else s"the $lang tokenizer"
            fail(s"$article is not enabled; set '$env' to 'true' to enable")
          }
        }
      case "object" | "object[]" =>
        fail("tokenization is not allowed for object/object[] data types")
      case other =>
        fail(s"tokenization is not allowed for data type '$other'")
    }
  }

  // ==========================================================================
  // Vector-index / quantization defaults resolution
  // ==========================================================================

  /** One quantizer section of a resolved vector-index config, flattened to
   * the fields the acceptance suite reads (default_quantization_test.go). */
  final case class ResolvedQuantization(
      quantizer: String,            // "rq" | "bq" | "pq" | "sq" | "" (none)
      bits: Int,                    // rq only
      rescoreLimit: Long,           // rq/bq
      skipDefaultQuantization: Boolean,
      trackDefaultQuantization: Boolean) {
    def render: String =
      if (quantizer.isEmpty) s"none;skip=$skipDefaultQuantization;track=$trackDefaultQuantization"
      else s"$quantizer;bits=$bits;rescoreLimit=$rescoreLimit;" +
        s"skip=$skipDefaultQuantization;track=$trackDefaultQuantization"
  }

  /** An absent/empty vectorIndexType resolves to DEFAULT_VECTOR_INDEX
   * (vectorindex.DefaultVectorIndexType = hnsw; usecases/schema/class.go:
   * setDefaultQuantization's len==0 arm and the create-path default —
   * default_vector_index_test.go pins hnsw for both class-level and named
   * vectors, and an env override flows through verbatim). */
  def resolveVectorIndexType(vectorIndexType: Option[String],
                             defaultVectorIndex: String = "hnsw"): String = {
    // "none" is the dropped-index sentinel, never a creatable type
    // (usecases/schema/parser.go:250-254 — alter_schema's
    // drop_vector_index_reject_test.go pins the text)
    if (vectorIndexType.contains("none"))
      throw new IllegalArgumentException(
        "parse vector index config: \"none\" is not a valid vector index type; " +
        "it is an internal sentinel for dropped indexes")
    val it = vectorIndexType.filter(_.nonEmpty).getOrElse(defaultVectorIndex)
    // parser.go:256-259: only the four real types parse (this engine's IVF
    // is the hnsw analogue SERVED under these declared types, never a wire
    // type of its own)
    if (!Set("hnsw", "flat", "dynamic", "hfresh").contains(it))
      throw new IllegalArgumentException(
        s"""parse vector index config: unsupported vector index type: "$it"""")
    it
  }

  /** Class-level guard for NAMED vector entries on a brand-new class
   * (usecases/schema/class.go:1108-1113): a "none"-typed VectorConfig
   * entry may only appear through DeleteClassVectorIndex's marker. */
  def rejectDroppedSentinel(vectorName: String, indexType: String): Unit =
    if (indexType == "none")
      throw new IllegalArgumentException(
        s"""vector "$vectorName": cannot create a new class with vectorIndexType "none"; """ +
        "this is an internal sentinel for dropped indexes")

  /** DEFAULT_QUANTIZATION resolution for ONE index's config
   * (hnsw.ParseDefaultQuantization, config.go:340-375 /
   * flat.ParseDefaultQuantization, config.go:269-300): an explicit
   * quantizer or skipDefaultQuantization=true leaves the config alone
   * (track=false); otherwise rq-1/rq-4/rq-8/bq/pq/sq apply with the
   * per-index rescore defaults — hnsw rq-8/rq-4 → DefaultRQRescoreLimit 20,
   * rq-1 → DefaultBRQRescoreLimit 512; flat always
   * DefaultCompressionRescore −1 — and track=true. pq/sq are hnsw-only. */
  def resolveQuantization(indexType: String, defaultQuantization: String,
                          explicitQuantizer: Option[String] = None,
                          skipDefaultQuantization: Boolean = false): ResolvedQuantization = {
    def untouched(q: String) = ResolvedQuantization(q, 0, 0,
      skipDefaultQuantization, trackDefaultQuantization = false)
    explicitQuantizer match {
      case Some(q) => untouched(q)
      case None if skipDefaultQuantization => untouched("")
      case None => defaultQuantization match {
        case "" | "none" => untouched("")
        case "rq-8" | "rq-4" | "rq-1" =>
          val bits = defaultQuantization.stripPrefix("rq-").toInt
          val rescore =
            if (indexType == "flat") -1L            // flat.DefaultCompressionRescore
            else if (bits == 1) 512L                // hnsw.DefaultBRQRescoreLimit
            else 20L                                // hnsw.DefaultRQRescoreLimit
          ResolvedQuantization("rq", bits, rescore, skipDefaultQuantization = false,
            trackDefaultQuantization = true)
        case "bq" =>
          ResolvedQuantization("bq", 0,
            if (indexType == "flat") -1L else 0L, skipDefaultQuantization = false,
            trackDefaultQuantization = true)
        case "pq" | "sq" if indexType != "flat" =>
          ResolvedQuantization(defaultQuantization, 0, 0,
            skipDefaultQuantization = false, trackDefaultQuantization = true)
        case other => fail(s"invalid default quantization for $indexType index: $other")
      }
    }
  }

  /** The full per-class resolution: a dynamic index resolves BOTH its
   * sub-configs (hnsw + flat, each with its own rescore default —
   * default_quantization_test.go's dynamic arms). Returns
   * (resolvedIndexType, section → resolved). */
  def resolveIndexDefaults(vectorIndexType: Option[String],
                           defaultQuantization: String,
                           explicitQuantizer: Option[String] = None,
                           skipDefaultQuantization: Boolean = false,
                           defaultVectorIndex: String = "hnsw")
      : (String, Map[String, ResolvedQuantization]) = {
    val it = resolveVectorIndexType(vectorIndexType, defaultVectorIndex)
    val sections =
      if (it == "dynamic")
        Map(
          "hnsw" -> resolveQuantization("hnsw", defaultQuantization,
            explicitQuantizer, skipDefaultQuantization),
          "flat" -> resolveQuantization("flat", defaultQuantization,
            explicitQuantizer, skipDefaultQuantization))
      else Map(it -> resolveQuantization(it, defaultQuantization,
        explicitQuantizer, skipDefaultQuantization))
    (it, sections)
  }
}
