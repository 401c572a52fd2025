package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * `_additional { summary(properties: [...]) { property result } }` — the
 * reference's sum-transformers module (modules/sum-transformers/additional/
 * summary/summary_result.go:24-75): for each result, every REQUESTED property
 * that exists with a non-empty string value is summarized, and the output is
 * a list of {property, result} entries. Requesting no properties is an error
 * (summary_result.go:38-40).
 *
 * The SUM model itself is a module boundary (modules/sum-transformers/ent) —
 * here a pluggable column transform with a deterministic extractive stand-in,
 * mirroring the Generate/Rerank module pattern. The reference iterates its
 * per-result property map in Go's random order; the engine determinizes to
 * requested-property order.
 *
 * Scale shape: pure column expressions over the bounded (paginated) result
 * page — no UDF, no driver loop, fully codegen'd.
 */
object Summarize {

  /** property-text column → summary-text column. Real deployments plug a
   * summarization model client here. */
  type Client = Column => Column

  val Col = "_summary"

  /** Deterministic extractive stand-in: the first `n` whitespace tokens. */
  def leadTokens(n: Int): Client = c =>
    concat_ws(" ", slice(split(c, "\\s+"), 1, n))

  /** Attach `_summary`: array<struct<property,result>> over the page. */
  def attach(page: DataFrame, props: Seq[(String, Column)], client: Client): DataFrame = {
    require(props.nonEmpty, "no properties provided")
    // a null/empty property contributes no entry (summary_result.go:50-56
    // keeps only non-empty string values)
    val entries = props.map { case (name, c) =>
      when(c.isNotNull && length(c) > 0,
        struct(lit(name).as("property"), client(c).as("result")))
    }
    page.withColumn(Col, filter(array(entries: _*), e => e.isNotNull))
  }
}
