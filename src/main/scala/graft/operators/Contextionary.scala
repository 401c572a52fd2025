package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Contextionary-module additional properties, re-expressed against a
 * pluggable CONCEPT VOCABULARY — a (word, vector) table standing in for the
 * reference's remote contextionary service (the module boundary, exactly
 * like the embedder/reranker/generator hooks). The vocabulary is module
 * data: small (like stopword presets), driver-resident, shipped as plan
 * literals.
 *
 *  - `_additional { nearestNeighbors }`: per result, the `limit` vocabulary
 *    words nearest to the result vector (reference: modules/
 *    text2vec-contextionary/additional/nearestneighbors/extender.go —
 *    MultiNearestWordsByVector per result, DefaultLimit 10, $-prefixed
 *    internal markers removed).
 *  - `_additional { semanticPath }`: a greedy concept walk from the SEARCH
 *    vector to each result vector (reference: additional/sempath/builder.go
 *    — ≤ 25 results validated, nearX-only since it needs the search vector;
 *    walk: 10 nearest candidates to the current position, discard those not
 *    strictly closer to the target than the best-so-far, step to the
 *    nearest survivor — buildPath:233-260; annotations are COSINE distances
 *    to previous/next/query/result in the embedding space —
 *    addDistancesToPath:305-360). DIVERGENCE, documented: the reference
 *    walks in a t-SNE-projected 2-D space seeded with time.Now()
 *    (builder.go:36 fixedSeed), i.e. its paths are not reproducible run to
 *    run; this engine walks in the ORIGINAL space with the reference's
 *    float-l2 step metric, which is deterministic, keeps the same output
 *    shape and annotation semantics, and makes the walk oracle-replayable.
 *
 * Scale shape: nearestNeighbors is a pure column expression over the
 * bounded page (vocab rides the plan as a literal — no join, no shuffle);
 * semanticPath collects the ≤ 25-row page driver-side exactly like the
 * reference computes it per returned result (same bounded-page rule as
 * featureProjection/merge-group).
 */
object Contextionary {

  val NeighborsCol = "_nearestNeighbors"
  val PathCol = "_semanticPath"
  val InterpretationCol = "_interpretation"

  /**
   * `_additional { interpretation }` (reference: additional/interpretation/
   * interpretation.go + models.go InterpretationSource — the source words
   * that built the object vector, with occurrence and weight, computed at
   * vectorization time by the contextionary service and stored alongside the
   * vector). Stand-in semantics matching the bag-of-words stand-in
   * vectorizer: concept = each distinct corpus token in first-occurrence
   * order, occurrence = its count in THIS object's corpus, weight =
   * occurrence / corpus length (every token occurrence contributes equally
   * to the hash embedding — the real contextionary weighs by global corpus
   * frequency, which lives module-side). Pure column expressions over the
   * page; the corpus column is the SAME VectorizerCorpus rule the embedding
   * was built from, so the interpretation really explains the vector.
   */
  def attachInterpretation(page: DataFrame, corpus: Column): DataFrame = {
    val toks = graft.text.Tokenize.word(corpus)
    // Bind the token array ONCE as a lambda variable (single-element
    // transform binder): a bare reference to `toks` inside the per-element
    // lambdas would be re-inlined by CollapseProject and re-run the
    // tokenizer once per distinct token per row. The occurrence count is
    // computed once per token; weight derives from the struct field.
    val counted = element_at(
      transform(array(toks), ts =>
        transform(array_distinct(ts), w => struct(
          w.as("concept"),
          size(filter(ts, t => t === w)).cast("long").as("occurrence"),
          size(ts).as("total")))), 1)
    page.withColumn(InterpretationCol,
      transform(counted, e => struct(
        e.getField("concept").as("concept"),
        e.getField("occurrence").as("occurrence"),
        (e.getField("occurrence").cast("double") / e.getField("total"))
          .as("weight"))))
  }

  /** Vocabulary entry. Words starting with '$' are contextionary-internal
   * markers and are dropped from every surface (extender.go:117-131,
   * builder.go removeDuplicateNeighborsAndDollarNeighbors). */
  type Vocab = Seq[(String, Array[Float])]

  private def cleaned(vocab: Vocab): Vocab = {
    require(vocab.nonEmpty, "concept vocabulary must not be empty")
    val out = vocab.filterNot(_._1.startsWith("$")).distinctBy(_._1)
    require(out.nonEmpty, "concept vocabulary contains only $-internal markers")
    out
  }

  /** Attach `_nearestNeighbors`: array<struct<concept, distance>> of the
   * `limit` nearest vocabulary words by cosine distance, ties broken on the
   * word (the reference's sort is Go's unstable sort.Slice — pinned here
   * for reproducibility). */
  def attachNeighbors(page: DataFrame, vecCol: String, vocab: Vocab,
                      limit: Int = 10): DataFrame = {
    require(limit >= 1, "limit must be >= 1")
    val voc = cleaned(vocab)
    val vocLit = typedLit(voc.map { case (w, v) => (w, v.toSeq) })
    val scored = transform(vocLit, e =>
      struct(
        org.apache.spark.sql.graft.VectorFunctions
          .cosineDistance(e.getField("_2"), col(vecCol)).as("d"),
        e.getField("_1").as("concept")))
    val top = slice(array_sort(scored), 1, limit)
    page.withColumn(NeighborsCol,
      transform(top, e => struct(
        e.getField("concept").as("concept"),
        e.getField("d").as("distance"))))
  }

  /** One semantic-path element (models.go:31-38). */
  final case class PathElement(concept: String,
                               distanceToNext: Option[Double],
                               distanceToPrevious: Option[Double],
                               distanceToQuery: Double,
                               distanceToResult: Double)

  // double-precision throughout (float diffs would diverge from the
  // double-math oracle replay on near-ties)
  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val t = a(i).toDouble - b(i); s += t * t; i += 1 }
    math.sqrt(s)
  }

  private def cosineDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    1.0 - dot / math.sqrt(na * nb)
  }

  /** The greedy walk of builder.go buildPath (original-space variant — see
   * scaladoc): candidates = 10 nearest to `current`, keep those STRICTLY
   * closer to the target than every previous step, move to the nearest
   * survivor. A stepped-to concept can never repeat (it fails its own
   * strict bound), so the walk terminates in ≤ |vocab| steps. */
  private[graft] def walk(searchVector: Array[Float], target: Array[Float],
                          voc: Vocab): Seq[String] = {
    val path = Seq.newBuilder[String]
    var current = searchVector
    var minDist = Double.MaxValue
    var continue = true
    while (continue) {
      val nn10 = voc.map { case (w, v) => (w, v, l2(v, current)) }
        .sortBy { case (w, _, d) => (d, w) }.take(10)
      val survivors = nn10.filter { case (_, v, _) => l2(v, target) < minDist }
      if (survivors.isEmpty) continue = false
      else {
        val (w, v, _) = survivors.minBy { case (w, _, d) => (d, w) }
        path += w
        current = v
        minDist = l2(v, target)
      }
    }
    path.result()
  }

  /** Attach `_semanticPath` to the bounded page (collects ≤ 25 rows,
   * reference validation builder_params.go:25-37). */
  def attachPath(page: DataFrame, idCol: String, vecCol: String,
                 searchVector: Array[Float], vocab: Vocab): DataFrame = {
    require(searchVector.nonEmpty,
      s"no valid search vector present, got: ${searchVector.mkString(",")}")
    val voc = cleaned(vocab)
    // limit(26): enough rows to detect an oversized page without ever
    // collecting an unbounded one (the engine validates the requested
    // limit up front; this is the defense for direct callers)
    val rows = page.select(col(idCol), col(vecCol)).limit(26).collect()
    require(rows.length <= 25,
      s"result length ${rows.length} is larger than 25 items: semantic path " +
      "calculation is only suported up to 25 items, set a limit to <= 25")
    val byWord = voc.toMap
    val paths: Seq[(Any, Seq[PathElement])] = rows.toSeq.map { r =>
      val target = r.getSeq[Float](1).toArray
      val words = walk(searchVector, target, voc)
      val elems = words.zipWithIndex.map { case (w, i) =>
        val v = byWord(w)
        PathElement(
          concept = w,
          distanceToNext =
            if (i < words.length - 1) Some(cosineDist(v, byWord(words(i + 1)))) else None,
          distanceToPrevious =
            if (i > 0) Some(cosineDist(v, byWord(words(i - 1)))) else None,
          distanceToQuery = cosineDist(v, searchVector),
          distanceToResult = cosineDist(v, target))
      }
      (r.get(0), elems)
    }
    val spark = page.sparkSession
    val elemType = StructType(Seq(
      StructField("concept", StringType, nullable = false),
      StructField("distanceToNext", DoubleType, nullable = true),
      StructField("distanceToPrevious", DoubleType, nullable = true),
      StructField("distanceToQuery", DoubleType, nullable = false),
      StructField("distanceToResult", DoubleType, nullable = false)))
    val schema = StructType(Seq(
      StructField("__sp_id", page.schema(idCol).dataType, nullable = false),
      StructField(PathCol, ArrayType(elemType, containsNull = false), nullable = false)))
    val data = paths.map { case (id, elems) =>
      Row(id, elems.map(e => Row(e.concept, e.distanceToNext.orNull,
        e.distanceToPrevious.orNull, e.distanceToQuery, e.distanceToResult)))
    }
    val pathDf = spark.createDataFrame(
      java.util.Arrays.asList(data: _*), schema)
    // bounded-page broadcast join back onto the page
    page.join(broadcast(pathDf), col(idCol) === col("__sp_id"), "left")
      .drop("__sp_id")
  }
}
