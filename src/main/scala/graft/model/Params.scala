package graft.model

/**
 * Logical query IR — mirrors weaviate's `dto.GetParams`
 * (reference: entities/dto/dto.go:49-71) and `aggregation.Params`
 * (reference: entities/aggregation/params.go:25-42). The planner composes
 * DataFrame operations from these case classes; rewrites (overfetch, fusion,
 * strategy choice) happen on this IR in plain Scala so they are unit-testable.
 */

/** Distance metrics (reference: adapters/repos/db/vector/hnsw/distancer, entities/additional/distance.go). */
sealed abstract class Metric(val name: String)
object Metric {
  case object Cosine    extends Metric("cosine")      // 1 - cos(a,b)
  case object Dot       extends Metric("dot")         // -dot(a,b)
  case object L2Squared extends Metric("l2-squared")
  case object Manhattan extends Metric("manhattan")
  case object Hamming   extends Metric("hamming")
  /** "Use the target vector's schema-configured metric" — in the reference
   * the distance is CLASS config, not a query argument
   * (entities/vectorindex/common config `distance`, default cosine); the
   * engine resolves Default against CollectionSchema.vectorMetrics at the
   * query entry, while an explicit per-query metric stays available as an
   * engine extension. */
  case object Default   extends Metric("default")
}

/** One multi-target query position: a single embedding, or a ColBERT-style
 * token bag scored by MaxSim against a multi-vector target. The reference's
 * `models.Vector` is exactly this union ([]float32 | [][]float32), and its
 * gRPC parse may UNROLL one payload into several positions — a MULTI_FP32
 * payload against a regular target becomes one Single per row, against a
 * multi-vector target one Multi (parse_search_request.go:1448-1476). */
sealed trait TargetQuery { def isMulti: Boolean }
object TargetQuery {
  final case class Single(v: Array[Float]) extends TargetQuery { def isMulti = false }
  final case class Multi(vs: Array[Array[Float]]) extends TargetQuery { def isMulti = true }
  def singles(vs: Seq[Array[Float]]): Seq[TargetQuery] = vs.map(Single(_))
}

/** nearVector (reference: entities/searchparams/retrieval.go:33-39).
 * `vectors`, when non-empty, carries ONE query PER target position — the
 * reference's `Vectors []models.Vector` aligned by index with
 * `TargetVectors` (shard_read.go searches `searchVectors[i]` against target
 * i's index). Target NAMES may repeat (the same space queried with several
 * vectors, each position separately weighted — grpc_search_test.go's
 * ["regular","regular"] arms) and positions may mix Single and Multi
 * queries. Empty `vectors` searches the single `vector` against every
 * target. */
final case class NearVector(
    vector: Array[Float],
    metric: Metric = Metric.Cosine,
    distance: Option[Double] = None,   // max distance threshold
    certainty: Option[Double] = None,  // cosine only: certainty = 1 - d/2
    targetVectors: Seq[String] = Nil,
    combination: TargetCombination = TargetCombination.Minimum,
    vectors: Seq[TargetQuery] = Nil) {
  require(vectors.isEmpty || vectors.size == targetVectors.size,
    s"nearVector: ${vectors.size} query vectors for ${targetVectors.size} targets")
  /** The query at the i-th target position. */
  def targetQuery(i: Int): TargetQuery =
    if (vectors.nonEmpty) vectors(i) else TargetQuery.Single(vector)
  /** The single query vector at position i — index-probe paths only ever see
   * Single positions (the planner routes Multi positions to the exact scan). */
  def queryFor(i: Int): Array[Float] = targetQuery(i) match {
    case TargetQuery.Single(v) => v
    case TargetQuery.Multi(_) => throw new IllegalStateException(
      s"nearVector: position $i is a multi-vector query; index probing requires Single")
  }
  /** Any position carrying a multi-vector (MaxSim) query. */
  def hasMultiQuery: Boolean = vectors.exists(_.isMulti)
}

/** Multi-vector (ColBERT-style) nearVector: the query is a bag of token
 * vectors, the target named vector is `array<array<float>>`, ranking is
 * MaxSim late interaction (reference: entities/dto/dto.go:73-90,
 * shard_read.go:687-698, vector/multivector/). */
final case class NearMultiVector(
    vectors: Array[Array[Float]],
    targetVectors: Seq[String] = Nil)

/** nearObject: kNN by another object's vector (reference: retrieval.go:128-135). */
final case class NearObject(
    id: Any,
    metric: Metric = Metric.Cosine,
    distance: Option[Double] = None,
    certainty: Option[Double] = None,
    targetVectors: Seq[String] = Nil)

/** nearText move parameters (reference: usecases/modulecomponents/arguments/
 * nearText/param.go:145; movement math searcher_movements.go). Besides
 * concept strings, a move can pull toward/away from EXISTING OBJECTS by id
 * (reference: retrieval.go:137-140 ObjectMove — beacon parsing is the HTTP
 * layer's job, both forms resolve to the target id; searcher.go:99-139
 * vectorFromValuesAndObjects looks each object's stored vector up and means
 * it with the combined concepts vector). */
final case class MoveParams(concepts: Seq[String], force: Double,
                            objects: Seq[Any] = Nil)

/** nearText: concepts → embedding (via the engine's registered embedder) →
 * kNN, with moveTo/moveAwayFrom concept arithmetic
 * (reference: retrieval.go:137-160). */
final case class NearText(
    concepts: Seq[String],
    metric: Metric = Metric.Cosine,
    distance: Option[Double] = None,
    certainty: Option[Double] = None,
    moveTo: Option[MoveParams] = None,
    moveAwayFrom: Option[MoveParams] = None,
    targetVectors: Seq[String] = Nil,
    autocorrect: Boolean = false)         // spellcheck module hook (retrieval.go:152-160)

/** Media kinds for nearImage/nearAudio/… (reference: grpc/proto/v1/
 * search_get.proto:42-47 — one base64-payload message per modality). */
sealed abstract class MediaKind(val name: String)
object MediaKind {
  case object Image   extends MediaKind("image")
  case object Audio   extends MediaKind("audio")
  case object Video   extends MediaKind("video")
  case object Depth   extends MediaKind("depth")
  case object Thermal extends MediaKind("thermal")
  case object Imu     extends MediaKind("imu")
}

/** nearImage/nearAudio/…: media payload → module embedding → kNN (reference:
 * search_get.proto:42-47; modules/multi2vec-bind, multi2vec-clip). The engine
 * only sees the payload and the registered media embedder — the same module
 * boundary as nearText's vectorizer. */
final case class NearMedia(
    kind: MediaKind,
    payload: Array[Byte],
    metric: Metric = Metric.Cosine,
    distance: Option[Double] = None,
    certainty: Option[Double] = None,
    targetVectors: Seq[String] = Nil)

/** Multi-target combination modes (reference: entities/dto/dto.go:30-48).
 * Weights are POSITIONAL, aligned with `targetVectors` — the reference's
 * `Weights []float32` (extractWeights matches weightsForTargets[i].target
 * against targetVectors[i], so the same target name may appear twice with
 * different weights). An empty seq reads as weight 1.0 per position. */
sealed trait TargetCombination
object TargetCombination {
  case object Minimum extends TargetCombination
  case object Sum     extends TargetCombination
  case object Average extends TargetCombination
  final case class ManualWeights(weights: Seq[Double]) extends TargetCombination
  final case class RelativeScore(weights: Seq[Double]) extends TargetCombination
}

/** BM25 searchOperator (reference: retrieval.go:41-48). */
sealed trait SearchOperator
object SearchOperator {
  final case class Or(minimumMatch: Int = 1) extends SearchOperator
  case object AndOp extends SearchOperator
  /** OPERATOR_AND_CROSS (common_filters/bm25.go:24): AND across properties —
   * requires every searched property to share one tokenization/analyzer
   * configuration (bm25_searcher.go sharedCrossPropQueryTerms), then a doc
   * must carry EVERY query term in some searched property. */
  case object AndCross extends SearchOperator
}

/** BM25/BM25F keyword ranking (reference: entities/searchparams/retrieval.go:54-65). */
final case class Bm25(
    query: String,
    properties: Seq[String] = Nil,            // empty = all searchable text props; "prop^2" boosts
    searchOperator: SearchOperator = SearchOperator.Or(1),
    k1: Double = 1.2,                         // defaults: usecases/config/config_handler.go:57-58
    b: Double = 0.75)

/** Fusion algorithms (reference: usecases/traverser/hybrid/hybrid_fusion.go). */
sealed trait FusionType
object FusionType {
  case object Ranked        extends FusionType // RRF: sum w/(60+rank)
  case object RelativeScore extends FusionType // min-max normalized weighted sum (default)
}

/** One explicit weighted hybrid sub-search leg (reference:
 * entities/searchparams/retrieval.go:105-109 WeightedSearchResult; GraphQL
 * assembly adapters/handlers/graphql/local/common_filters/hybrid.go:72-111 —
 * each subsearch is bm25 | nearText | nearVector with its own weight).
 * Exactly one of the three legs must be set. */
final case class HybridSubSearch(
    weight: Double,
    bm25: Option[Bm25] = None,
    nearVector: Option[NearVector] = None,
    nearText: Option[NearText] = None) {
  require(Seq(bm25, nearVector, nearText).count(_.isDefined) == 1,
    "hybrid subsearch: exactly one of bm25 | nearVector | nearText")
}

/** hybrid (reference: retrieval.go:111-126, explorer_hybrid.go:37-120).
 * When `subSearches` is non-empty it REPLACES the alpha-weighted
 * query/vector legs (reference: common_filters/hybrid.go subsearch list). */
final case class Hybrid(
    query: String,
    vector: Option[Array[Float]] = None,      // dense leg; None => no dense leg
    metric: Metric = Metric.Cosine,
    alpha: Double = 0.75,                     // 0 = pure keyword, 1 = pure vector
    fusionType: FusionType = FusionType.RelativeScore,
    properties: Seq[String] = Nil,
    maxVectorDistance: Option[Double] = None, // dense-leg cutoff (retrieval.go:120-121)
    targetVectors: Seq[String] = Nil,
    subSearches: Seq[HybridSubSearch] = Nil,
    // keyword-leg operator, copied into the BM25 params exactly like the
    // reference's explorer_hybrid.go:53-55 copies HybridSearch.SearchOperator
    // / MinimumOrTokensMatch into KeywordRanking
    searchOperator: SearchOperator = SearchOperator.Or(1),
    // dense leg given as a nearText instead of a raw vector (reference:
    // retrieval.go:124 HybridSearch.NearTextParams; explorer_hybrid.go:138+
    // nearTextSubSearch resolves it through the module incl. moves). The
    // engine resolves it to `vector` before the legs run.
    nearText: Option[NearText] = None,
    // full multi-target dense leg (reference: retrieval.go:123
    // HybridSearch.NearVectorParams + TargetVectors/combination — the gRPC
    // parse routes hs.NearVector through parseNearVec with hs.Targets, and
    // explorer_hybrid.go feeds the resulting params to the dense search).
    // When set it REPLACES the plain `vector` leg.
    denseParams: Option[NearVector] = None) {
  require(vector.isEmpty || nearText.isEmpty,
    "hybrid: set either vector or nearText, not both")
}

/** sort (reference: entities/filters/sort.go:15-18). */
final case class SortBy(path: Seq[String], desc: Boolean = false)
object SortBy {
  def asc(p: String): SortBy  = SortBy(p.split('/').toSeq, desc = false)
  def desc(p: String): SortBy = SortBy(p.split('/').toSeq, desc = true)
}

/** limit/offset (reference: entities/filters/pagination.go). */
final case class Pagination(offset: Int = 0, limit: Int = 25)

/** keyset pagination (reference: entities/filters/cursor.go:14-37). */
final case class Cursor(after: Option[Any], limit: Int)

/** result grouping for searches (reference: searchparams groupBy + shard_group_by.go:29-208). */
final case class GroupByParams(property: String, groups: Int, objectsPerGroup: Int)

/** Terminal MMR diversification of the result page (reference:
 * searchparams.Selection{MMR{Limit, Balance}}; selection/mmr.go — balance 1
 * = pure relevance, 0 = pure diversity). */
final case class SelectionMmrParams(limit: Int, balance: Double) {
  require(balance >= 0 && balance <= 1, "MMR balance must be between 0 and 1")
}

/** `_additional { rerank(property:..., query:...) { score } }` — post-search
 * re-scoring of the bounded result page via the engine's registered reranker
 * module (reference: usecases/modulecomponents/additional/rank/
 * rank_params_extractor.go — the two GraphQL arguments; rank_result.go:30-86
 * for semantics). */
final case class RerankParams(property: String, query: String)

// --- Boost post-scoring (reference: entities/filters/boost.go,
// usecases/traverser/boost_scorer.go; wire search_get.proto:218-263) ---

/** One boost condition — exactly one of the four kinds set; weight 0 is
 * treated as 1.0 by the scorer (scoreResult), negatives demote. */
final case class BoostCondition(
    filter: Option[Where] = None,
    timeDecay: Option[TimeDecayParams] = None,
    numericDecay: Option[NumericDecayParams] = None,
    propertyValue: Option[PropertyValueParams] = None,
    weight: Double = 1.0)

/** origin "" or "now" = query time; scale/offset accept `<n>(d|h|m|s|ms)`
 * durations or plain numbers (parseNumericOrDuration — numbers are
 * NANOSECONDS like Go durations). */
final case class TimeDecayParams(property: String, origin: String = "",
    scale: String = "", offset: String = "", curve: String = "",
    decayValue: Double = 0)

final case class NumericDecayParams(property: String, origin: Double,
    scale: Double, offset: Double = 0, curve: String = "",
    decayValue: Double = 0)

/** modifier: "" | "log1p" | "sqrt" (applied before min-max normalization). */
final case class PropertyValueParams(property: String, modifier: String = "")

/** weight blends normalized-primary vs boost score; depth bounds the
 * rescored candidate pool (default QueryBoostDefaultDepth = 100,
 * environment.go:1898). */
final case class BoostParams(conditions: Seq[BoostCondition],
    weight: Double, depth: Option[Int] = None)

/** `_additional { generate }` — generative search / RAG (reference:
 * usecases/modulecomponents/additional/generate/generate_params.go:15-18:
 * `singleResult { prompt }` per result, `groupedResult { task properties }`
 * once over all results). At least one of the two must be set. */
final case class GenerateParams(
    singlePrompt: Option[String] = None,
    groupedTask: Option[String] = None,
    groupedProperties: Seq[String] = Nil) {
  require(singlePrompt.isDefined || groupedTask.isDefined,
    "generate: set singlePrompt and/or groupedTask")
}

/** `_additional { summary(properties: [...]) { property result } }` — the
 * sum-transformers module surface (modules/sum-transformers/additional/
 * summary/summary_params.go; per-result list of {property, result}). */
final case class SummaryParams(properties: Seq[String]) {
  require(properties.nonEmpty, "no properties provided")
}

/** `_additional { answer(question: ...) { result property startPosition
 * endPosition hasAnswer } }` — the qna-transformers module surface
 * (modules/qna-transformers/additional/answer). Empty `properties` = all
 * text properties, like the module's containsProperty fallback. */
final case class AskParams(question: String, properties: Seq[String] = Nil) {
  require(question.trim.nonEmpty, "empty question")
}

/** `_additional { tokens(properties: [...], certainty: ..., limit: ...) }` —
 * the ner-transformers module surface (modules/ner-transformers/additional/
 * tokens/tokens_params.go). */
final case class NerParams(properties: Seq[String],
                           certainty: Option[Double] = None,
                           limit: Option[Int] = None) {
  require(properties.nonEmpty, "no properties provided")
}

/** `_additional { featureProjection(dimensions:...) { vector } }` — t-SNE
 * dimensionality reduction over the returned result page (reference:
 * usecases/modulecomponents/additional/projector/projector_params.go:31-39
 * defaults; projector.go Reduce). Defaults mirror the reference's. */
final case class FeatureProjectionParams(
    algorithm: String = "tsne",
    dimensions: Int = 2,
    perplexity: Option[Int] = None,
    iterations: Int = 100,
    learningRate: Int = 25)

/** The Get query (reference: dto.GetParams). Exactly one search leg may be set. */
final case class GetParams(
    collection: String,
    where: Option[Where] = None,
    nearVector: Option[NearVector] = None,
    nearObject: Option[NearObject] = None,
    nearText: Option[NearText] = None,
    nearMedia: Option[NearMedia] = None,
    nearMultiVector: Option[NearMultiVector] = None,
    bm25: Option[Bm25] = None,
    hybrid: Option[Hybrid] = None,
    sort: Seq[SortBy] = Nil,
    pagination: Option[Pagination] = None,
    cursor: Option[Cursor] = None,
    groupBy: Option[GroupByParams] = None,
    properties: Seq[String] = Nil,            // empty = all declared props
    additional: Set[String] = Set.empty,      // "id","distance","certainty","score","vector",...
    // named-vector metadata request (reference: MetadataRequest.vectors,
    // search_get.proto:87 — return ONLY these named vector spaces, each
    // tagged with its name in MetadataResult.vectors). Distinct from
    // additional("vector"), which returns every space.
    additionalVectors: Seq[String] = Nil,
    resolveRefs: Seq[String] = Nil,           // cref props to expand into structs
    // per resolved ref prop: which target classes the query's inline
    // fragments (`... on Class`) named — multi-class refs resolve ONLY the
    // edges landing in a requested class (multi_reftype_bug_test.go); empty
    // seq / absent key = all declared targets. Single-class refs ignore it.
    refTargetClasses: Map[String, Seq[String]] = Map.empty,
    // per resolved ref prop: `_additional` metadata fields the fragments
    // requested on the TARGET objects (id/vector/creationTimeUnix/
    // lastUpdateTimeUnix — local_get_with_additional_test.go's "in
    // reference" arms); resolved structs carry them as _refid/_refvector/
    // _refcreated/_refupdated. Absent = plain property resolution.
    refAdditional: Map[String, Set[String]] = Map.empty,
    tenant: Option[String] = None,
    autocut: Option[Int] = None,
    rerank: Option[RerankParams] = None,
    boost: Option[BoostParams] = None,
    generate: Option[GenerateParams] = None,
    summary: Option[SummaryParams] = None,
    ask: Option[AskParams] = None,
    ner: Option[NerParams] = None,
    selectionMmr: Option[SelectionMmrParams] = None,
    featureProjection: Option[FeatureProjectionParams] = None)

// --- Aggregations (reference: entities/aggregation/params.go) ---

sealed abstract class Aggregator(val name: String)
object Aggregator {
  case object Count   extends Aggregator("count")
  case object Sum     extends Aggregator("sum")
  case object Mean    extends Aggregator("mean")
  case object Median  extends Aggregator("median")
  case object Mode    extends Aggregator("mode")
  case object Minimum extends Aggregator("minimum")
  case object Maximum extends Aggregator("maximum")
  case object TotalTrue       extends Aggregator("totalTrue")
  case object TotalFalse      extends Aggregator("totalFalse")
  case object PercentageTrue  extends Aggregator("percentageTrue")
  case object PercentageFalse extends Aggregator("percentageFalse")
  final case class TopOccurrences(limit: Int = 5) extends Aggregator("topOccurrences")
  // schema lookups, answered without scanning (reference: params.go:118
  // `type`, :148-150 `pointingTo` — properties of the class schema, not of
  // the data; pointingTo is the cref's target class list)
  case object Type       extends Aggregator("type")
  case object PointingTo extends Aggregator("pointingTo")
}

final case class AggregateParams(
    collection: String,
    groupBy: Option[Seq[String]] = None,      // property path; arrays explode into groups
    properties: Map[String, Seq[Aggregator]] = Map.empty,
    includeMetaCount: Boolean = false,
    where: Option[Where] = None,
    nearVector: Option[NearVector] = None,
    nearObject: Option[NearObject] = None,    // resolved like Get's legs (traverser_aggregate.go:60-105)
    nearText: Option[NearText] = None,
    nearMedia: Option[NearMedia] = None,
    hybrid: Option[Hybrid] = None,
    objectLimit: Option[Int] = None,          // scope aggs to top-N search hits (params.go:32-41)
    limit: Option[Int] = None,                // cap number of groups
    tenant: Option[String] = None)
