package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Tokenization
import graft.text.Tokenize

/**
 * Reranker: re-score an already-bounded result set against a query string
 * over one text property, attach `_additional { rerank { score } }`, and
 * re-sort descending by that score (reference:
 * usecases/modulecomponents/additional/rank/rank_result.go:30-86 — the
 * provider extracts `rankProperty` per hit, calls the module client's
 * `Rank(query, documents)`, attaches the score and sorts desc;
 * provider_ranker.go dispatches it as an _additional property AFTER the
 * search pipeline, so it only ever sees the final `limit`-bounded page).
 *
 * The scoring client is a module boundary in the reference (reranker-cohere /
 * reranker-transformers / ... are external cross-encoder services,
 * modules/reranker-*). No such model runs in this environment, so the
 * pluggable scorer here is a Column → Column function and the default is a
 * deterministic LEXICAL stand-in: the fraction of distinct word-tokenized
 * query terms that appear as whole words in the document property. That
 * keeps the engine-side contract (bounded input, score attach, desc
 * re-sort) real and oracle-checkable while the neural scorer stays
 * swappable — exactly how the engine treats text2vec embedders.
 *
 * Scale note: rerank input is the POST-pagination frame (≤ limit rows, the
 * reference semantics), so the desc re-sort is a bounded TopK, never a
 * collection-wide shuffle; the scorer itself is codegen'd (rlike per term).
 *
 * Divergence, pinned in RerankSpec: the reference re-sorts with Go's
 * unstable sort.Slice (rank_result.go:78-84) — equal scores land in
 * arbitrary order. We tie-break score ties by ascending id so results are
 * deterministic (the repo-wide determinism rule).
 */
object Rerank {

  val ScoreCol = "_rerank_score"

  /** (documentProperty, query) => score column. */
  type Scorer = (Column, String) => Column

  /** Default module stand-in: |query terms present as whole words| / |query
   * terms|, terms word-tokenized + deduped like Tokenization.Word. Null or
   * term-free inputs score 0.0, matching the reference's treatment of a
   * missing rankProperty as the empty document. */
  val lexicalOverlap: Scorer = (doc: Column, query: String) => {
    val terms = Tokenize.queryTokens(Tokenization.Word, query).distinct
    if (terms.isEmpty) lit(0.0)
    else {
      val low = lower(doc)
      val hits = terms.map(t =>
        when(low.rlike("\\b" + java.util.regex.Pattern.quote(t) + "\\b"), 1).otherwise(0))
      coalesce(hits.reduce(_ + _) / lit(terms.size.toDouble), lit(0.0))
    }
  }

  /** Attach the score and re-sort desc (id asc tie-break). */
  def apply(results: DataFrame, id: Column, property: Column, query: String,
            scorer: Scorer = lexicalOverlap): DataFrame =
    results.withColumn(ScoreCol, scorer(property, query))
      .orderBy(col(ScoreCol).desc, id.asc)
}
