package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** PII redaction and Gopher-style repetition signals (edge cases the
 * oracle-backed corpus queries don't exercise). */
class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("redactPii replaces emails, IPv4s, and phone shapes; leaves clean text") {
    val rows = Seq(
      "mail me at jane_d.99+x@sub.example.co.uk thanks",
      "server at 10.0.255.7 rebooted",
      "call +44 (020) 7946-0958 now",
      "call 415-555-0133 now",
      "just words, no pii 42").toDF("t")
    val got = rows.select(TextAnalysis.redactPii($"t").as("r")).as[String].collect()
    assert(got(0) == "mail me at [EMAIL] thanks")
    assert(got(1) == "server at [IP] rebooted")
    assert(got(2) == "call [PHONE] now")
    assert(got(3) == "call [PHONE] now")
    assert(got(4) == "just words, no pii 42")
  }

  test("repetitionStats: duplicate lines and dominant bigrams") {
    val df = Seq(
      (1L, "alpha beta\nalpha beta\ngamma"), // 3 lines, 1 dup
      (2L, "x y x y x y"),                   // bigrams: xy yx xy yx xy → top 3/5
      (3L, "one"),                           // single token → no bigrams
      (4L, "")                               // empty → zero lines
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, $"doc_id", $"text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_lines"), r.getAs[Double]("dup_line_frac"), r.getAs[Double]("top_bigram_frac"))))
      .toMap
    assert(out(1L)._1 == 3)
    assert(math.abs(out(1L)._2 - (1.0 - 2.0 / 3.0)) < 1e-9)
    assert(math.abs(out(2L)._3 - 0.6) < 1e-9)
    assert(out(3L) == ((1, 0.0, 0.0)))
    assert(out(4L) == ((0, 0.0, 0.0)))
  }

  test("lmPerplexity: in-distribution text scores lower than out-of-distribution") {
    // corpus dominated by one repeated bigram chain; doc 3 is made of tokens
    // that never co-occur in the training data; doc 4 too short to score
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat"),
      (2L, "the cat sat on the mat"),
      (3L, "zeppelin quartz vortex mumble"),
      (4L, "single")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmPerplexity(docs, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(!out.contains(4L), "sub-2-token docs have no bigram positions")
    // every score is finite and positive (smoothing covers unseen bigrams)
    assert(out.values.forall { case (_, h, p) => h > 0 && p > 1 && !h.isInfinite })
    // the frequent-bigram doc is most in-distribution; the unseen-bigram doc least
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2,
      s"expected H(1) < H(2) < H(3), got $out")
    // perplexity = 2^H
    val (_, h, p) = out(2L)
    assert(math.abs(p - math.pow(2.0, h)) < 1e-9)
    // external training corpus: scoring doc 3 against itself as train data
    // drops its cross-entropy (its bigrams are now seen)
    val selfTrained = TextAnalysis.lmPerplexity(
      docs.filter($"doc_id" === 3L), $"doc_id", $"text").collect()(0).getDouble(2)
    assert(selfTrained < out(3L)._2)
  }
}
