package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Tokenization

/**
 * Text tokenization modes, expressed as pure Catalyst column functions so they
 * stay inside whole-stage codegen (reference: entities/tokenizer/tokenizer.go:228-279
 * for mode dispatch; entities/models/property.go:160-186 for the mode set;
 * stopword presets adapters/repos/db/inverted/stopwords/).
 *
 * CJK modes (gse/kagome) need dictionary-backed segmenters that aren't
 * available in this environment; `word` handles unicode letter runs which is
 * the documented fallback.
 */
object Tokenize {

  /** `word`: runs of letters/digits, lowercased. */
  def word(c: Column): Column =
    filterEmpty(regexp_extract_all(lower(c), lit("[\\p{L}\\p{N}]+"), lit(0)))

  /** `lowercase`: split on whitespace, lowercased. */
  def lowercase(c: Column): Column =
    filterEmpty(split(lower(c), "\\s+"))

  /** `whitespace`: split on whitespace, case preserved. */
  def whitespace(c: Column): Column =
    filterEmpty(split(c, "\\s+"))

  /** `field`: the whole trimmed value as a single token. */
  def field(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(array(trim(c)))

  /** `trigram`: sliding 3-grams over lowercased, whitespace-stripped text. */
  def trigram(c: Column): Column = charNgrams(c, 3)

  /** Sliding character n-grams (whitespace stripped, lowercased). */
  def charNgrams(c: Column, n: Int): Column = {
    val s = regexp_replace(lower(c), "\\s+", "")
    when(c.isNull, lit(null))
      .when(length(s) === 0, array().cast("array<string>"))
      .when(length(s) < n, array(s))
      .otherwise(transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
  }

  /** Sliding token n-grams ("shingles") over a token array — feeds MinHash dedup. */
  def tokenNgrams(tokens: Column, n: Int): Column =
    when(tokens.isNull, lit(null))
      .when(size(tokens) < n, when(size(tokens) > 0, array(concat_ws(" ", tokens))).otherwise(array().cast("array<string>")))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))

  /** Declared-but-unavailable CJK modes fail loudly (reference mode set:
   * tokenizer.go:228-279) instead of silently degrading to another mode. */
  private def cjkUnavailable(mode: Tokenization): Nothing =
    throw new UnsupportedOperationException(
      s"tokenization '${mode.name}' requires a dictionary-backed CJK segmenter " +
      "(reference: entities/tokenizer/tokenizer.go:228-279 — gse/kagome) which is " +
      "not available in this environment; use 'word' (unicode letter runs) or " +
      "register a segmenter UDF for this property")

  def apply(mode: Tokenization)(c: Column): Column = mode match {
    case Tokenization.Word       => word(c)
    case Tokenization.Lowercase  => lowercase(c)
    case Tokenization.Whitespace => whitespace(c)
    case Tokenization.Field      => field(c)
    case Tokenization.Trigram    => trigram(c)
    case m @ (Tokenization.Gse | Tokenization.GseCh |
              Tokenization.KagomeJa | Tokenization.KagomeKr) => cjkUnavailable(m)
  }

  /** Tokenize a query string on the driver with matching semantics. */
  def queryTokens(mode: Tokenization, q: String): Seq[String] = mode match {
    case Tokenization.Word       => "[\\p{L}\\p{N}]+".r.findAllIn(q.toLowerCase).toSeq
    case Tokenization.Lowercase  => q.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    case Tokenization.Whitespace => q.split("\\s+").toSeq.filter(_.nonEmpty)
    case Tokenization.Field      => Seq(q.trim)
    case Tokenization.Trigram    =>
      val s = q.toLowerCase.replaceAll("\\s+", "")
      if (s.isEmpty) Nil else if (s.length < 3) Seq(s) else s.sliding(3).toSeq
    case m @ (Tokenization.Gse | Tokenization.GseCh |
              Tokenization.KagomeJa | Tokenization.KagomeKr) => cjkUnavailable(m)
  }

  /** English stopword preset (reference: inverted/stopwords/presets.go, `en`). */
  val StopwordsEn: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
    "into", "is", "it", "no", "not", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was", "will", "with")

  def removeStopwords(tokens: Column, stop: Set[String] = StopwordsEn): Column = {
    val stopArr = array(stop.toSeq.sorted.map(lit): _*)
    filter(tokens, t => !array_contains(stopArr, t))
  }

  private def filterEmpty(arr: Column): Column =
    filter(arr, t => length(t) > 0)
}
