package graft.model

/**
 * Collection schema model — the WHAT of weaviate's class/property system
 * (reference: entities/models/class.go:32-72, entities/schema/data_types.go:27-72).
 *
 * A collection maps to one parquet/Delta-backed DataFrame whose columns are the
 * declared properties plus engine metadata (`id`, vectors, timestamps, tenant).
 * Schemas are dynamic per collection, so the engine is DataFrame-based, not
 * typed-Dataset-based.
 */
sealed abstract class PropType(val name: String)
object PropType {
  case object Text          extends PropType("text")
  case object Int           extends PropType("int")       // int64
  case object Number        extends PropType("number")    // float64
  case object Bool          extends PropType("boolean")
  case object Date          extends PropType("date")      // RFC3339; engine keeps TimestampType (+ optional ns column)
  case object Uuid          extends PropType("uuid")
  case object Geo           extends PropType("geoCoordinates") // struct<lat:double,lon:double>
  // struct<input,internationalFormatted,countryCode,national,nationalFormatted,valid,defaultCountry>
  // (reference: entities/models/phone_number.go; data_types.go:27-72) —
  // filters must descend into a subfield (e.g. phone/national)
  case object Phone         extends PropType("phoneNumber")
  case object Blob          extends PropType("blob")      // BinaryType — multimodal payloads
  case object Obj           extends PropType("object")    // nested StructType
  case object Ref           extends PropType("cref")      // id(s) of target collection
  case class Arr(elem: PropType) extends PropType(s"${elem.name}[]")
}

/**
 * Tokenization modes for text properties
 * (reference: entities/models/property.go:160-186, entities/tokenizer/tokenizer.go:228-279).
 */
sealed abstract class Tokenization(val name: String)
object Tokenization {
  case object Word       extends Tokenization("word")        // alphanumeric runs, lowercased
  case object Lowercase  extends Tokenization("lowercase")   // whitespace split, lowercased
  case object Whitespace extends Tokenization("whitespace")  // whitespace split, case kept
  case object Field      extends Tokenization("field")       // whole value, trimmed
  case object Trigram    extends Tokenization("trigram")     // sliding 3-grams of lowercased text
  // CJK segmenter modes (reference: tokenizer.go:228-279) — declared so the
  // dispatch fails LOUDLY rather than silently missing; they need
  // dictionary-backed segmenters not shipped in this environment
  case object Gse      extends Tokenization("gse")           // Chinese (gse)
  case object GseCh    extends Tokenization("gse_ch")        // Chinese, char mode
  case object KagomeJa extends Tokenization("kagome_ja")     // Japanese (kagome)
  case object KagomeKr extends Tokenization("kagome_kr")     // Korean (kagome)
}

/** One declared property of a collection. */
final case class Property(
    name: String,
    dataType: PropType,
    tokenization: Tokenization = Tokenization.Word,
    // which collection a cref points at (reference: beacon URIs, refcache/resolver.go:51)
    refTarget: Option[String] = None,
    // multi-class cref: ONE beacon list whose edges may target any of these
    // classes (reference: entities/models MultipleRef, multi-entry dataType
    // in entities/schema/data_types.go; regression test
    // test/acceptance/graphql_resolvers/multi_reftype_bug_test.go). Mutually
    // exclusive with refTarget; edges store beacons (optionally
    // class-qualified) instead of bare target ids.
    refTargets: Seq[String] = Nil,
    indexFilterable: Boolean = true,
    indexSearchable: Boolean = true,
    // accent folding applied to indexed text AND query/filter terms
    // (reference: entities/models/text_analyzer_config.go ASCIIFold;
    // algorithm entities/tokenizer/ascii_fold.go)
    asciiFold: Boolean = false,
    // rangeable index flag — int/number/date only, default OFF
    // (reference: adapters/repos/db/inverted/objects.go HasRangeableIndex)
    indexRangeFilters: Boolean = false) {

  /** Every class a cref may target — one for classic single-class refs,
   * several for multi-class refs (MultipleRef). */
  def allRefTargets: Seq[String] =
    if (refTargets.nonEmpty) refTargets else refTarget.toSeq

  /** True when the cref's beacon list may mix target classes; such columns
   * store beacons (class-qualified or short) rather than bare ids. */
  def isMultiRef: Boolean = refTargets.size > 1

  /** Searchable index exists only on text/text[] (objects.go:575-585). */
  def hasSearchableIndex: Boolean = indexSearchable &&
    (dataType == PropType.Text || dataType == PropType.Arr(PropType.Text))

  /** Rangeable index exists only on int/number/date (objects.go:598-608). */
  def hasRangeableIndex: Boolean = indexRangeFilters && (dataType match {
    case PropType.Int | PropType.Number | PropType.Date => true
    case _ => false
  })

  /** Any inverted index at all (objects.go:611-613) — filters on a property
   * with none of the three must error like the reference. */
  def hasAnyInvertedIndex: Boolean =
    indexFilterable || hasSearchableIndex || hasRangeableIndex
}

/**
 * Class-level inverted-index config (reference: entities/models/class.go
 * InvertedIndexConfig). The three gates default FALSE exactly like the
 * reference — len()/IsNull/timestamp-metadata filters ERROR unless the
 * collection opted in (adapters/repos/db/inverted/prop_value_pairs.go:379-389).
 */
final case class InvertedIndexConfig(
    indexTimestamps: Boolean = false,
    indexNullState: Boolean = false,
    indexPropertyLength: Boolean = false)

/**
 * A collection ("class"). `idColumn` plays the role of weaviate's uuid primary
 * key (any orderable unique column works — keyset pagination and tie-breaking
 * order by it). `vectors` maps named-vector name → DataFrame column holding
 * array<float> (reference: entities/models/class.go VectorConfig).
 */
/**
 * Stopword configuration (reference: entities/models/stopword_config.go —
 * preset + additions/removals; presets inverted/stopwords/presets.go: `en`,
 * `none`, defaulting to `en`). Semantics: the INDEX stores all tokens
 * including stopwords (analyzer.go:178), but word-tokenized BM25 query terms
 * and text-filter terms DROP them; a query/filter value reduced to nothing
 * by stopword removal is an error (searcher.go ErrOnlyStopwords).
 */
final case class StopwordConfig(
    preset: String = "en",
    additions: Seq[String] = Nil,
    removals: Seq[String] = Nil)

/**
 * Creation-time schema name validation (reference: entities/schema/
 * validation.go — class regex `[A-Z][_0-9A-Za-z]{0,254}`, property regex
 * `[_A-Za-z][_0-9A-Za-z]{0,230}` with the 231-char dir-name budget, target
 * vector regex `[_A-Za-z][_0-9A-Za-z]{0,229}`, reserved property names
 * {_additional, _id, id} and the internal-index suffix blocklist
 * validation.go:40-50). Applied by `Graft.register` — the creation path —
 * with the reference's own error shapes.
 */
object SchemaValidation {
  private val ClassNameRe = "[A-Z][_0-9A-Za-z]{0,254}".r
  private val PropertyNameRe = "[_A-Za-z][_0-9A-Za-z]{0,230}".r
  private val VectorNameRe = "[_A-Za-z][_0-9A-Za-z]{0,229}".r
  private val ReservedProps = Set("_additional", "_id", "id")
  private val ReservedSuffixes = Seq(
    "_searchable", "_rangeable", "_temp", "__meta_count",
    "_propertyLength", "_nullState")

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Aliases validate exactly like class names (ValidateAliasName,
   * usecases/schema/alias.go:115-117). */
  def validateClassName(name: String): Unit =
    if (!ClassNameRe.pattern.matcher(name).matches())
      fail(s"'$name' is not a valid class name")

  def validate(schema: CollectionSchema): Unit = {
    if (!ClassNameRe.pattern.matcher(schema.name).matches())
      fail(s"'${schema.name}' is not a valid class name")
    val seen = scala.collection.mutable.Set.empty[String]
    schema.properties.foreach { p =>
      if (p.name.length > 231)
        fail(s"'${p.name}' is not a valid property name. " +
          "Name should not be longer than 231 characters")
      if (!PropertyNameRe.pattern.matcher(p.name).matches())
        fail(s"'${p.name}' is not a valid property name. " +
          "Property names are restricted to valid GraphQL names, " +
          "which must be \"/[_A-Za-z][_0-9A-Za-z]{0,230}/\"")
      if (ReservedProps.contains(p.name))
        fail(s"'${p.name}' is a reserved property name")
      ReservedSuffixes.find(p.name.endsWith).foreach(sfx =>
        fail(s"'${p.name}' is not a valid property name: " +
          s"suffix '$sfx' is reserved for internal indices"))
      if (!seen.add(p.name))
        fail(s"class '${schema.name}' already has a conflicting property '${p.name}'")
    }
    schema.vectors.keys.foreach { v =>
      if (!VectorNameRe.pattern.matcher(v).matches())
        fail(s"'$v' is not a valid vector name")
    }
  }
}

final case class CollectionSchema(
    name: String,
    idColumn: String,
    properties: Seq[Property],
    vectors: Map[String, String] = Map.empty,
    defaultVector: Option[String] = None,
    tenantColumn: Option[String] = None,
    // `_creationTimeUnix` / `_lastUpdateTimeUnix` pseudo-props resolve to
    // these columns (reference: searcher.go:816 metadata filters)
    creationTimeColumn: Option[String] = None,
    updateTimeColumn: Option[String] = None,
    // physical unit of the two metadata-timestamp columns ("ns" | "ms"):
    // the reference stores epoch MILLISECONDS (entities/filters/
    // filters_validator.go timestamps; objects carry creationTimeUnix in
    // ms), while ingest beds built on TIMESTAMP(NANOS) parquet keep ns —
    // valueDate filter literals convert through this unit
    timestampUnit: String = "ns",
    stopwords: StopwordConfig = StopwordConfig(),
    invertedIndex: InvertedIndexConfig = InvertedIndexConfig(),
    // per-named-vector distance config (reference: the metric is CLASS
    // config — entities/vectorindex/common `distance`, default cosine —
    // never a query argument); Metric.Default query legs resolve here
    vectorMetrics: Map[String, Metric] = Map.empty,
    // text2vec moduleConfig vectorizeClassName (reference: object_texts.go —
    // whether the camelCase-split class name prefixes the vectorizer corpus;
    // the acceptance Company class sets it false, and the interpretation
    // resolver explains the SAME corpus)
    vectorizeClassName: Boolean = true) {

  private val byName: Map[String, Property] = properties.map(p => p.name -> p).toMap
  def property(name: String): Option[Property] = byName.get(name)

  /** Resolve the target vector name: explicit target, else the configured
   * default, else the ONLY vector. With several named vectors and no
   * default, a target is REQUIRED (the reference errors too) — a
   * headOption over a hash-ordered map would search a nondeterministically
   * chosen column. */
  private def vectorKey(target: Option[String]): String =
    target.orElse(defaultVector).getOrElse {
      if (vectors.isEmpty)
        throw new IllegalArgumentException(s"collection $name has no vectors")
      if (vectors.size > 1)
        throw new IllegalArgumentException(
          s"collection $name has ${vectors.size} named vectors and no " +
          "default — specify targetVectors")
      vectors.keys.head
    }

  def vectorColumn(target: Option[String]): String = {
    val key = vectorKey(target)
    vectors.getOrElse(key,
      throw new IllegalArgumentException(s"collection $name has no vector named $key"))
  }

  /** The configured metric of a named vector (None = the default vector);
   * unconfigured vectors take the reference's default, cosine. An UNKNOWN
   * vector name errors like vectorColumn (a typo must not silently resolve
   * to cosine). */
  def metricFor(target: Option[String]): Metric = {
    val key = vectorKey(target)
    if (!vectors.contains(key))
      throw new IllegalArgumentException(s"collection $name has no vector named $key")
    vectorMetrics.getOrElse(key, Metric.Cosine)
  }
}
