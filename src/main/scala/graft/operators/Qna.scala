package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * `_additional { answer(question: ...) { result property startPosition
 * endPosition hasAnswer } }` — the reference's qna-transformers module
 * (modules/qna-transformers/additional/answer/answer_result.go:26-95):
 * per result, the selected text properties join into one passage, the QA
 * model extracts an answer span, and `findProperty` (answer_result.go:143-159)
 * localizes the answer back to the FIRST property whose lowercased,
 * newline-flattened value contains it — yielding {result, property,
 * startPosition, endPosition, hasAnswer}; a no-answer result carries only
 * hasAnswer=false. The reference iterates its property map in Go's random
 * order; the engine determinizes to declared-property order.
 *
 * The extractive-QA model is a module boundary — here a pluggable client
 * with a deterministic stand-in: the answer is the `answerChars`-character
 * window of the passage starting at the first occurrence of the question's
 * first non-stopword term (lowercased, exactly what findProperty needs to
 * re-locate it). Real deployments plug a reader model.
 *
 * Scale shape: pure column expressions over the bounded result page.
 */
object Qna {

  /** (joined passage column, question) → answer column (null = no answer). */
  type Client = (Column, String) => Column

  val Col = "_answer"

  /** Attach `_answer` over the page. `props` in declared order — the joined
   * passage skips null/empty values (answer_result.go:48-56). */
  def attach(page: DataFrame, props: Seq[(String, Column)], question: String,
             client: Option[Client] = None, answerChars: Int = 60): DataFrame = {
    require(question.trim.nonEmpty, "empty question")
    require(props.nonEmpty, "no text properties to answer from")
    val nonEmpty = props.map { case (_, c) => when(c.isNotNull && length(c) > 0, c) }
    val passage = array_join(filter(array(nonEmpty: _*), e => e.isNotNull), " ")
    val answer = client match {
      case Some(cl) => cl(passage, question)
      case None =>
        val toks = graft.text.Tokenize
          .queryTokens(graft.model.Tokenization.Word, question, fold = false)
        val informative = toks.filterNot(graft.text.Tokenize.StopwordsEn)
        require(informative.nonEmpty, "empty question")
        val term = informative.head
        val pos = instr(lower(passage), term)
        when(pos > 0, lower(passage).substr(pos, lit(answerChars)))
    }
    // findProperty: first declared prop whose lowercased newline-flattened
    // value contains the (lowercase) answer; "" + 0,0 when none does
    val notFound = struct(lit("").as("property"), lit(0L).as("start"))
    val located = props.foldRight(notFound) { case ((name, c), acc) =>
      val v = lower(regexp_replace(c, "\n", " "))
      // lowercase the answer too: the stand-in extractor is already
      // lowercase, but a plugged client may return original-case spans that
      // would otherwise never locate inside the lowercased property
      val p = instr(v, lower(col("__qna_ans")))
      when(c.isNotNull && p > 0,
        struct(lit(name).as("property"), (p - 1).cast("long").as("start")))
        .otherwise(acc)
    }
    val noAnswer = struct(
      lit(null).cast("string").as("result"),
      lit(null).cast("string").as("property"),
      lit(null).cast("long").as("start_position"),
      lit(null).cast("long").as("end_position"),
      lit(false).as("has_answer"))
    page.withColumn("__qna_ans", answer)
      .withColumn(Col,
        when(col("__qna_ans").isNotNull,
          struct(
            col("__qna_ans").as("result"),
            located.getField("property").as("property"),
            located.getField("start").as("start_position"),
            // reference findProperty (answer_result.go:143-159): an answer
            // not locatable inside any single property reports
            // (property "", start 0, end 0) — not 0 + len(answer)
            when(located.getField("property") === "", lit(0L))
              .otherwise(located.getField("start") + length(col("__qna_ans")))
              .as("end_position"),
            lit(true).as("has_answer")))
          .otherwise(noAnswer))
      .drop("__qna_ans")
  }
}
