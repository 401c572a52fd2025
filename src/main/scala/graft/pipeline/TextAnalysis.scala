package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.text.Tokenize

/**
 * Text-analysis operators for training-data pipelines (engine extensions
 * beyond the weaviate surface): language ID, quality scoring, token counting,
 * document fingerprinting. All pure column expressions — one scan, fully
 * codegen'd, no UDFs — so they compose with filters/dedup at any scale.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWhitespace(text: Column): Column = size(Tokenize.whitespace(text))

  /** BPE-ish subword count: word tokens + digit runs + punctuation pieces,
   * long words counted as ceil(len/4) pieces (a cheap proxy for byte-pair
   * merges — deterministic and vocabulary-free). */
  def tokenCountBpeIsh(text: Column): Column = {
    val pieces = regexp_extract_all(lower(text), lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0))
    aggregate(pieces, lit(0L), (acc, p) => acc + ceil(length(p) / 4.0).cast("long"))
  }

  /** Ratio of punctuation characters to all non-space characters. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s+", "")).cast("double")
    val punct = length(regexp_replace(text, "[\\p{L}\\p{N}\\s]+", "")).cast("double")
    when(nonSpace === 0, 0.0).otherwise(punct / nonSpace)
  }

  /** Fraction of word-tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = Tokenize.word(text)
    val stopArr = array(Tokenize.StopwordsEn.toSeq.sorted.map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks))
  }

  /** Mean word-token length. */
  def meanTokenLen(text: Column): Column = {
    val toks = Tokenize.word(text)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / size(toks))
  }

  /**
   * Composite quality score in [0,1] from length/punct/stopword signals
   * (the shape of Gopher/C4-style quality rules): docs that are too short,
   * all-punctuation, or stopword-free score low.
   */
  def qualityScore(text: Column): Column = {
    val nToks = size(Tokenize.word(text)).cast("double")
    val lengthOk = least(nToks / 50.0, lit(1.0))                  // ≥50 tokens → full credit
    val punctOk = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0)) // >25% punct → 0
    val stopOk = least(stopwordRatio(text) * 10.0, lit(1.0))      // ≥10% stopwords → full credit
    (lengthOk + punctOk + stopOk) / 3.0
  }

  /** Per-language stopword profiles for the n-gram-free language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "that"),
    "es" -> Seq("el", "la", "de", "los", "las", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des", "que", "est", "une"))

  /** Predicted language = profile with the most distinct stopword hits;
   * ties break to the alphabetically-first language (deterministic). */
  def languageId(text: Column): Column = {
    val toks = Tokenize.word(text)
    val scored = LangProfiles.map { case (lang, words) =>
      val hits = words.map(w => array_contains(toks, w).cast("int")).reduce[Column](_ + _)
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    // max by (hits asc → take max; tie → smallest lang wins because array_max
    // on struct compares lexicographically and we negate nothing): sort by
    // (hits, reverse-alphabetical lang) and take the max ⇒ highest hits,
    // then alphabetically-last... so instead order langs descending and use >=
    val best = scored.reduce[Column]((a, b) => when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    best.getField("lang")
  }

  /** Stable document fingerprint: md5 of the normalized (word-token) text. */
  def fingerprint(text: Column): Column = md5(concat_ws(" ", Tokenize.word(text)))
}
