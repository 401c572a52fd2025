package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** C4 heuristic cleaning rules (Raffel et al. 2020 §2.2) on planted pages —
 * one page per rule. */
class C4CleanSpec extends SparkSpecBase {
  import spark.implicits._

  private val keepers = Seq(
    "first clean sentence here.",
    "second clean sentence here!",
    "third clean sentence here?",
    "fourth clean sentence here.",
    "fifth clean sentence here.")

  test("line rules: terminal punctuation, min words, javascript") {
    val page = (keepers ++ Seq(
      "this line has no terminal punctuation",
      "too short.",
      "please enable JavaScript to continue.")).mkString("\n")
    val out = TextAnalysis.c4Clean(Seq((1L, page)).toDF("id", "text"), col("text"))
      .select("c4_text", "c4_lines_kept", "c4_lines_total").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == keepers.mkString("\n"))
    assert(out.head.getInt(1) == 5 && out.head.getInt(2) == 8)
  }

  test("page rules: lorem ipsum, brace, sentence minimum, blocklist") {
    val pages = Seq(
      (1L, keepers.mkString("\n")),                                   // clean
      (2L, (keepers :+ "lorem ipsum dolor sit amet.").mkString("\n")), // lorem
      (3L, (keepers :+ "code { block }").mkString("\n")),              // brace
      (4L, keepers.take(4).mkString("\n")),                            // 4 < 5 sentences
      (5L, (keepers :+ "a badword appears here.").mkString("\n")))     // blocklist
      .toDF("id", "text")
    val kept = TextAnalysis.c4Clean(pages, col("text"), blocklist = Seq("badword"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
    // without the blocklist, page 5 survives (no list ships by default)
    val keptNoBl = TextAnalysis.c4Clean(pages, col("text"))
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(keptNoBl == Seq(1L, 5L))
  }

  test("quotes and apostrophes count as terminal punctuation (C4 keeps end-quote lines)") {
    val page = (keepers ++ Seq("she said \"keep this line.\"", "it is theirs'")).mkString("\n")
    val out = TextAnalysis.c4Clean(Seq((1L, page)).toDF("id", "text"), col("text"))
      .select("c4_lines_kept").collect()
    assert(out.head.getInt(0) == 7)
  }

  test("plan: single scan, no shuffle, no UDF") {
    val pages = (0 until 100).map(i => (i.toLong, keepers.mkString("\n"))).toDF("id", "text")
    val plan = TextAnalysis.c4Clean(pages, col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c4Clean must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
