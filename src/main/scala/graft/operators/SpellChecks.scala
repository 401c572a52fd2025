package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * `_additional { spellCheck { originalText didYouMean location changes {
 * original corrected } } }` — the reference's text-spellcheck module
 * (modules/text-spellcheck/additional/spellcheck/spellcheck_result.go:30-99):
 * the QUERY texts (nearText concepts or the ask question) are spellchecked
 * once, and one {originalText, didYouMean, location, changes} entry per text
 * attaches identically to EVERY result row. didYouMean lowercases the text
 * and applies each change whose original it contains; location is
 * `nearText.concepts[i]` or `ask.question` (getSpellCheckLocation).
 *
 * The checker itself is the engine's registered spellchecker module (the
 * same hook nearText autocorrect uses); changes derive from a per-token diff
 * of the lowercased text against its fixed form.
 *
 * Scale shape: entirely query-scoped — a driver-built literal column, no
 * data pass at all.
 */
object SpellChecks {

  val Col = "_spellCheck"

  private val changesType = "array<struct<original:string,corrected:string>>"

  /** The literal `_spellCheck` column for the given query texts. */
  def additional(argName: String, texts: Seq[String],
                 fix: String => String): Column = {
    val entries = texts.zipWithIndex.map { case (t, i) =>
      var didYouMean = t.toLowerCase
      // per-token diff of the module's fix = the SpellCheckResult changes;
      // applied in token order exactly like the reference's ReplaceAll loop
      val changes = didYouMean.split(' ').distinct.flatMap { w =>
        val fixed = fix(w)
        if (fixed != w) Some((w, fixed)) else None
      }.toSeq
      val applied = changes.filter { case (o, _) => didYouMean.contains(o) }
        .map { case (o, c) => didYouMean = didYouMean.replace(o, c); (o, c) }
      val location =
        if (argName == "nearText") s"nearText.concepts[$i]" else "ask.question"
      struct(
        lit(t).as("original_text"),
        lit(didYouMean).as("did_you_mean"),
        lit(location).as("location"),
        (if (applied.isEmpty) array().cast(changesType)
         else array(applied.map { case (o, c) =>
           struct(lit(o).as("original"), lit(c).as("corrected")) }: _*))
          .as("changes"))
    }
    array(entries: _*)
  }
}
