package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generative search (`_additional { generate }`, RAG): attach model-generated
 * text to search results (reference: usecases/modulecomponents/additional/
 * generate/generate_result.go:29-60 — `singleResult` runs the client once per
 * result with `{prop}` substitution, `groupedResult` runs it ONCE over all
 * results' properties and attaches to the first result; prompt templating
 * usecases/modulecomponents/generative/generative.go:69-102).
 *
 * The LLM client itself is a module (generative-openai/-cohere/… behind
 * `modulecapabilities.GenerativeClient`) — here a pluggable `Client` function
 * with a deterministic `echo` stand-in, mirroring the Rerank module boundary.
 *
 * Scale shape: `single` is a pure column expression (template concat) plus at
 * most one UDF call per PAGE row (pagination bounds it — the reference's own
 * concurrency cap is 10 in-flight calls, generate.go:30); `grouped` collects
 * the bounded page driver-side (like the reference building one prompt from
 * all results) and runs one client call. Neither touches unbounded data.
 */
object Generate {

  /** prompt → completion. Real deployments plug an LLM client here. */
  type Client = String => String

  /** Deterministic stand-in module: returns the assembled prompt itself, so
   * the templating/plumbing is exactly testable (and oracle-checkable). */
  val echo: Client = identity

  val SingleCol  = "_generate"
  val GroupedCol = "_generate_grouped"

  // reference: generative.go:24 `{([\w\s]*?)}`, name trimmed
  private val Placeholder = java.util.regex.Pattern.compile("""\{([\w\s]*?)\}""")

  /**
   * MakeSinglePrompt as a codegen'd expression: `{prop}` placeholders become
   * property columns, everything else string literals, assembled with
   * `concat`. A null property value nulls the whole prompt (concat semantics)
   * — the Spark analogue of the reference's per-result "empty value" error
   * (generative.go:96-99), which also yields a nil singleResult.
   */
  def singlePromptColumn(prompt: String, resolve: String => Column): Column = {
    val m = Placeholder.matcher(prompt)
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    while (m.find()) {
      if (m.start > last) parts += lit(prompt.substring(last, m.start))
      parts += resolve(m.group(1).trim)
      last = m.end
    }
    if (last < prompt.length) parts += lit(prompt.substring(last))
    if (parts.isEmpty) lit(prompt) else concat(parts.toSeq: _*)
  }

  /** singleResult: one generation per result row. A null prompt (null
   * templated property) yields a null `_generate` WITHOUT invoking the client
   * — the reference records a per-result error and a nil singleResult there
   * (generative.go:96-99); Scala UDFs are not null-skipped for String args,
   * so the guard lives inside the UDF. */
  def single(page: DataFrame, prompt: String, resolve: String => Column,
             client: Client): DataFrame = {
    val tpl = singlePromptColumn(prompt, resolve)
    if (client eq echo) page.withColumn(SingleCol, tpl)
    else page.withColumn(SingleCol,
      udf((s: String) => if (s == null) null else client(s)).apply(tpl))
  }

  /**
   * groupedResult: ONE generation over the whole page. The prompt is the task
   * with `{prop}` replaced from the first result that has the property (name
   * kept verbatim when none does — generative.go:74-82), then `": " +
   * json([{prop: value}, …])` over every result's selected properties in page
   * order with sorted keys (Go `json.Marshal` of a map sorts keys). The
   * result attaches to the FIRST row only (generate_result.go:133
   * setCombinedResult(in, 0, …)); other rows carry null.
   */
  def grouped(page: DataFrame, idCol: Column, task: String,
              propCols: Seq[(String, Column)], client: Client): DataFrame = {
    val rows = page.select(idCol.cast("string").as("__gid") +:
      propCols.map { case (n, c) => c.cast("string").as(n) }: _*).collect()
    if (rows.isEmpty) return page.withColumn(GroupedCol, lit(null).cast("string"))
    val names = propCols.map(_._1)
    // rows whose selected properties are ALL null drop out of the JSON array
    // entirely — the reference filters empty Text maps before marshalling
    // (generative.Texts → MakeTaskPrompt)
    val maps: Seq[Map[String, String]] = rows.toSeq.map { r =>
      names.flatMap(n => Option(r.getAs[String](n)).map(n -> _)).toMap
    }.filter(_.nonEmpty)
    val m = Placeholder.matcher(task)
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(task.substring(last, m.start))
      val name = m.group(1).trim
      sb.append(maps.collectFirst { case mm if mm.contains(name) => mm(name) }
        .getOrElse(name))
      last = m.end
    }
    sb.append(task.substring(last))
    val json = maps.map(mm =>
      mm.toSeq.sortBy(_._1).map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }
        .mkString("{", ",", "}")).mkString("[", ",", "]")
    val out = client(s"${sb.result()}: $json")
    val firstId = rows.head.getString(0)
    page.withColumn(GroupedCol,
      when(idCol.cast("string") === lit(firstId), lit(out)))
  }

  /** JSON string escape matching Go's json.Marshal defaults (incl. the
   * HTML-safe escapes for `<`, `>`, `&`). */
  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '<'  => sb.append("\\u003c")
      case '>'  => sb.append("\\u003e")
      case '&'  => sb.append("\\u0026")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"').result()
  }
}
