package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * text2vec corpus assembly — the reference's canonical "object → embedding
 * input" rule shared by every text2vec module (usecases/modulecomponents/
 * vectorizer/object_texts.go Texts/TextsWithTitleProperty): optionally the
 * camelCase-split class name, then every non-skipped TEXT property in
 * property-name order, each value optionally prefixed by its camelCase-split
 * property name, text[] values inserted per element, everything lowercased
 * per config and joined with single spaces; an empty corpus falls back to
 * the class name. The module then embeds THIS string — so configs like
 * `skip` / `vectorizePropertyName` / `vectorizeClassName` change vectors
 * without touching the model.
 *
 * camelCase splitting approximates github.com/fatih/camelcase for ASCII
 * identifiers (case transitions + letter/digit boundaries).
 */
object VectorizerCorpus {

  final case class Config(
      vectorizeClassName: Boolean = true,
      lowerCase: Boolean = true,
      vectorizePropertyName: Set[String] = Set.empty,
      skip: Set[String] = Set.empty)

  /** fatih/camelcase-style split, space-joined: "camelCaseABCDef" →
   * "camel Case ABC Def", "GL11Version" → "GL 11 Version". */
  def camelSplit(s: String): String = s
    .replaceAll("([A-Z]+)([A-Z][a-z])", "$1 $2")
    .replaceAll("([a-z])([A-Z])", "$1 $2")
    .replaceAll("([A-Za-z])([0-9])", "$1 $2")
    .replaceAll("([0-9])([A-Za-z])", "$1 $2")
    .trim

  /**
   * The corpus column. `props` = (property name, value column) for the
   * class's text/text[] properties (pass text[] columns in `textArrays`);
   * nulls contribute nothing.
   */
  def column(className: String, props: Seq[(String, Column)],
             textArrays: Set[String] = Set.empty,
             cfg: Config = Config()): Column = {
    def lc(s: String): String = if (cfg.lowerCase) s.toLowerCase else s
    def lcCol(c: Column): Column = if (cfg.lowerCase) lower(c) else c
    val classPart = lit(lc(camelSplit(className)))
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    if (cfg.vectorizeClassName) pieces += classPart
    props.sortBy(_._1).foreach { case (name, c) =>
      if (!cfg.skip(name)) {
        val prefix = if (cfg.vectorizePropertyName(name)) lc(camelSplit(name)) + " " else ""
        if (textArrays(name))
          // per-element insert (object_texts.go:97-101): each element carries
          // its own optional property-name prefix
          pieces += when(c.isNotNull,
            array_join(transform(filter(c, e => e.isNotNull),
              e => concat(lit(prefix), lcCol(e))), " "))
        else
          pieces += when(c.isNotNull, concat(lit(prefix), lcCol(c)))
      }
    }
    // null pieces (absent values) and empty pieces (e.g. a zero-element
    // text[]) contribute nothing — no stray separators in the corpus
    val joined =
      if (pieces.isEmpty) lit("")
      else array_join(filter(array(pieces.toSeq: _*),
        p => p.isNotNull && length(p) > 0), " ")
    // empty-corpus fallback to the class name (object_texts.go:162-165)
    when(length(joined) === 0, classPart).otherwise(joined)
  }
}
