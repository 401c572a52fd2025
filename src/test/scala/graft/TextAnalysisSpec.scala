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

  test("gopherFilter: each rule trips on its own planted pathology") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ") // 50 alpha words, mean len ~5.5
    val docs = Seq(
      (1L, s"$fifty the be to of and"),                       // clean: passes all
      (2L, "too short the be"),                               // word count < 50
      (3L, (1 to 60).map(_ => "a").mkString(" ") + " the be"),// mean word length < 3
      (4L, s"$fifty the be " + (1 to 12).map(_ => "#").mkString(" ")), // symbol ratio > 0.1
      (5L, s"$fifty the be\n- b1\n- b2\n- b3"),               // 4 lines, 3 bullets → 75% < 90% passes
      (6L, s"$fifty the be\n- b1\n- b2\n- b3\n- b4\n- b5\n- b6\n- b7\n- b8\n- b9"), // 10 lines, 9 bullets = 90% trips
      (7L, s"$fifty the be " + (1 to 20).map(i => s"$i").mkString(" ")), // 20/72 numeric → alpha 72% < 80%
      (8L, fifty)                                             // 0 required words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(docs, $"text")
      .collect().map(r => r.getAs[Long]("doc_id") -> (
        (r.getAs[Boolean]("gopher_word_count"), r.getAs[Boolean]("gopher_mean_len"),
         r.getAs[Boolean]("gopher_symbol"), r.getAs[Boolean]("gopher_lines"),
         r.getAs[Boolean]("gopher_alpha"), r.getAs[Boolean]("gopher_required"),
         r.getAs[Boolean]("gopher_pass")))).toMap
    assert(out(1L) == ((true, true, true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._7)
    assert(!out(3L)._2, s"mean-len rule should trip: ${out(3L)}")
    assert(!out(4L)._3, s"symbol rule should trip: ${out(4L)}")
    assert(out(5L)._4, s"75% bullets stays under the 90% cap: ${out(5L)}")
    assert(!out(6L)._4, s"90% bullets trips the line rule: ${out(6L)}")
    assert(!out(7L)._5, s"alpha rule should trip: ${out(7L)}")
    assert(!out(8L)._6 && !out(8L)._7)
  }

  test("gopherRepetition: each fraction on hand-computable beds") {
    val docs = Seq(
      // 26 distinct words: every dup metric 0 and each count-1 top n-gram
      // fraction (n/26) sits under its cap — short docs with count-1 top
      // grams can trip the caps by construction (the known Gopher artifact)
      (1L, ('a' to 'z').mkString(" ")),
      (2L, "x y\nx y\nz"),                  // dup lines: 1/3 lines, 3/7 line chars
      (3L, "aa\n\naa\n\nbb"),               // dup paragraphs: 1/3, 2/6 chars
      (4L, "p q r s t u p q r s t u"),      // 6-word unit ×2: 5-gram coverage 1.0, no 10-gram dup
      (5L, "m n m n m n")                   // top 2-gram "m n" ×3, chars 2·3/6 = 1.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetition(docs, $"doc_id", $"text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    def d(id: Long, c: String) = out(id).getAs[Double](c)
    assert(d(1L, "dup_line_frac") == 0.0 && d(1L, "dup_5gram_char_frac") == 0.0)
    assert(out(1L).getAs[Boolean]("gopher_rep_pass"))
    assert(math.abs(d(2L, "dup_line_frac") - 1.0 / 3) < 1e-9)
    assert(math.abs(d(2L, "dup_line_char_frac") - 3.0 / 7) < 1e-9)
    assert(math.abs(d(3L, "dup_para_frac") - 1.0 / 3) < 1e-9)
    assert(math.abs(d(3L, "dup_para_char_frac") - 2.0 / 6) < 1e-9)
    assert(math.abs(d(4L, "dup_5gram_char_frac") - 1.0) < 1e-9,
      s"unit-copy doc covers every word: ${out(4L)}")
    assert(d(4L, "dup_10gram_char_frac") == 0.0, "two 6-word copies hold no repeated 10-gram")
    assert(!out(4L).getAs[Boolean]("gopher_rep_pass"))
    assert(math.abs(d(5L, "top_2gram_char_frac") - 1.0) < 1e-9, s"${out(5L)}")
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
