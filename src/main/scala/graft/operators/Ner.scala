package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * `_additional { tokens(properties: [...], certainty: ..., limit: ...) {
 * property entity certainty word startPosition endPosition } }` — the
 * reference's ner-transformers module (modules/ner-transformers/additional/
 * tokens/tokens_result.go:24-110): per result, each requested non-empty text
 * property runs through the NER model; token entries below the certainty
 * cutoff are dropped (cutOffByCertainty), and `limit` truncates the
 * accumulated cross-property list. Token shape per
 * additional/models/models.go:16-23. The reference iterates its property map
 * in Go's random order; the engine determinizes to requested-property order.
 *
 * The NER model is a module boundary — here a pluggable per-property
 * recognizer with a deterministic GAZETTEER stand-in: each dictionary entry
 * (word, entity, certainty) contributes one token at its FIRST occurrence in
 * the lowercased value (plain first-substring `instr` — NOT word-boundary
 * anchored, so "windows" yields a "window" token; matches the q_ner oracle's
 * strpos), in dictionary order. Real deployments plug a transformer NER.
 *
 * Scale shape: pure column expressions over the bounded result page.
 */
object Ner {

  /** One gazetteer entry of the stand-in recognizer. */
  final case class DictEntry(word: String, entity: String, certainty: Double)

  /** (property name, value column) → array<struct<property,entity,certainty,
   * word,start_position,end_position>>. */
  type Client = (String, Column) => Column

  val Col = "_tokens"

  /** Deterministic gazetteer recognizer (see scaladoc). */
  def dictionary(entries: Seq[DictEntry]): Client = (propName, value) => {
    val toks = entries.map { e =>
      // match case-insensitively on BOTH sides — gazetteer entries are
      // typically proper nouns, and an uppercase entry could never match
      // the lowercased value
      val pos = instr(lower(value), e.word.toLowerCase(java.util.Locale.ROOT))
      when(pos > 0, struct(
        lit(propName).as("property"),
        lit(e.entity).as("entity"),
        lit(e.certainty).as("certainty"),
        lit(e.word).as("word"),
        (pos - 1).cast("long").as("start_position"),
        (pos - 1 + e.word.length).cast("long").as("end_position")))
    }
    filter(array(toks: _*), t => t.isNotNull)
  }

  /** Attach `_tokens` over the page. */
  def attach(page: DataFrame, props: Seq[(String, Column)], client: Client,
             certainty: Option[Double] = None, limit: Option[Int] = None): DataFrame = {
    require(props.nonEmpty, "no properties provided")
    val perProp = props.map { case (name, c) =>
      // empty/null property values contribute no tokens (tokens_result.go:50-56)
      when(c.isNotNull && length(c) > 0, client(name, c))
        .otherwise(array().cast("array<struct<property:string,entity:string," +
          "certainty:double,word:string,start_position:bigint,end_position:bigint>>"))
    }
    val merged = concat(perProp: _*)
    val cut = certainty match {
      case Some(min) => filter(merged, t => t.getField("certainty") >= lit(min))
      case None      => merged
    }
    val limited = limit match {
      case Some(n) => slice(cut, 1, n)
      case None    => cut
    }
    page.withColumn(Col, limited)
  }
}
