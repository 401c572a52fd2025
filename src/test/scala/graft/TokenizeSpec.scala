package graft

import org.apache.spark.sql.functions._

import graft.model.Tokenization
import graft.text.Tokenize

class TokenizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def toks(mode: Tokenization, s: String): Seq[String] =
    Seq(s).toDF("t").select(Tokenize(mode)($"t").as("x")).head().getSeq[String](0)

  test("word: alphanumeric runs, lowercased") {
    assert(toks(Tokenization.Word, "Hello, World-42 foo_bar") ==
      Seq("hello", "world", "42", "foo", "bar"))
  }

  test("lowercase: whitespace split, lowered") {
    assert(toks(Tokenization.Lowercase, "Hello  World-42") == Seq("hello", "world-42"))
  }

  test("whitespace: case preserved") {
    assert(toks(Tokenization.Whitespace, "Hello  World") == Seq("Hello", "World"))
  }

  test("field: single trimmed token") {
    assert(toks(Tokenization.Field, "  Hello World ") == Seq("Hello World"))
  }

  test("trigram: sliding 3-grams, whitespace stripped") {
    assert(toks(Tokenization.Trigram, "ab cd") == Seq("abc", "bcd"))
    assert(toks(Tokenization.Trigram, "ab") == Seq("ab"))
  }

  test("queryTokens matches column tokenizer for every mode") {
    val samples = Seq("Hello, World-42", "a  B c", " x ")
    for (mode <- Seq(Tokenization.Word, Tokenization.Lowercase,
                     Tokenization.Whitespace, Tokenization.Trigram); s <- samples) {
      assert(Tokenize.queryTokens(mode, s) == toks(mode, s), s"mode=$mode s='$s'")
    }
  }

  test("CJK modes fail loudly (no silent fallback)") {
    for (mode <- Seq(Tokenization.Gse, Tokenization.GseCh,
                     Tokenization.KagomeJa, Tokenization.KagomeKr)) {
      val colErr = intercept[UnsupportedOperationException] {
        Tokenize(mode)(org.apache.spark.sql.functions.lit("中文テキスト"))
      }
      assert(colErr.getMessage.contains(mode.name) && colErr.getMessage.contains("segmenter"))
      val qErr = intercept[UnsupportedOperationException] {
        Tokenize.queryTokens(mode, "中文テキスト")
      }
      assert(qErr.getMessage.contains(mode.name))
    }
  }

  test("token n-grams (shingles)") {
    val sh = Seq(Seq("a", "b", "c", "d")).toDF("t")
      .select(Tokenize.tokenNgrams($"t", 3).as("x")).head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("stopword removal") {
    val out = Seq(Seq("the", "cat", "and", "dog")).toDF("t")
      .select(Tokenize.removeStopwords($"t").as("x")).head().getSeq[String](0)
    assert(out == Seq("cat", "dog"))
  }
}
