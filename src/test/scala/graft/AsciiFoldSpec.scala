package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsciiFold, TextFunctions}

import graft.engine.{Collection, Graft}
import graft.model._
import graft.operators.{Bm25Search, Postings}

/** Accent folding (reference: entities/tokenizer/ascii_fold.go + per-prop
 * textAnalyzer.asciiFold): table + NFD/strip-Mn/NFC algorithm, applied to
 * both the indexed text and query/filter terms. */
class AsciiFoldSpec extends SparkSpecBase {
  import spark.implicits._

  test("fold: NFD-decomposables, table entries, passthrough, ASCII identity") {
    // NFD path: combining marks stripped
    assert(AsciiFold.fold("café naïve Çelik") == "cafe naive Celik")
    assert(AsciiFold.fold("über señor tête") == "uber senor tete")
    // pre-decomposed input (e + combining acute) folds identically
    assert(AsciiFold.fold("café") == "cafe")
    // table entries NFD can't decompose (ascii_fold.go:31-52)
    assert(AsciiFold.fold("Łódź") == "Lodz")
    assert(AsciiFold.fold("København") == "Kobenhavn")
    assert(AsciiFold.fold("straße") == "strasse")
    assert(AsciiFold.fold("Ærø œuvre") == "AEro oeuvre")
    // capital thorn folds to "TH" (ascii_fold.go:99 — the Lucene table)
    assert(AsciiFold.fold("Þórr ð þ đ ħ ŧ ı") == "THorr d th d h t i")
    // non-Latin scripts pass through (only Mn marks strip)
    assert(AsciiFold.fold("中文 кириллица") == "中文 кириллица")
    // pure ASCII short-circuits unchanged
    val ascii = "plain ascii text 123!"
    assert(AsciiFold.fold(ascii) eq ascii)
  }

  test("column expression matches the driver fold") {
    val samples = Seq("café", "Łódź straße", "naïve Æ", "plain", "中文 é")
    val got = samples.toDF("t").select(TextFunctions.asciiFold($"t")).collect().map(_.getString(0))
    assert(got.toSeq == samples.map(AsciiFold.fold))
  }

  private lazy val docs = Seq(
    (1L, "cáfe sérver jöins the stream"),
    (2L, "cafe server handles a scan"),
    (3L, "unrelated wörds only")
  ).toDF("doc_id", "text")

  private def coll(fold: Boolean) = Collection(
    CollectionSchema("D", "doc_id",
      Seq(Property("text", PropType.Text, asciiFold = fold))), docs)

  test("BM25: folded prop scores accented and plain docs identically; query folds too") {
    val scores = Bm25Search.score(coll(fold = true), Bm25("càfe", Seq("text")))
      .select($"doc_id", $"_score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // both spellings of 'cafe' match (docs 1 and 2), and with identical dl
    // they score the same; doc 3 has no match
    assert(scores.keySet == Set(1L, 2L))
    // unfolded prop: the accented query term matches only the accented doc
    val unfolded = Bm25Search.score(coll(fold = false), Bm25("cáfe", Seq("text")))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(unfolded == Set(1L))
  }

  test("postings path folds identically to the scan path") {
    val c = coll(fold = true)
    val idx = Postings.build(c, Seq("text"), buckets = 2)
    val got = Postings.search(idx, "càfe", 10)
      .select($"doc_id", col(Bm25Search.ScoreCol)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Bm25Search.score(c, Bm25("càfe", Seq("text")))
      .select($"doc_id", $"_score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same docs; scores equal to the last-ULP association difference between
    // the two physical paths' expression trees
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (id, sc) => assert(math.abs(sc - want(id)) <= 1e-12 * math.abs(sc)) }
  }

  test("filters: Equal and Like fold both sides on asciiFold props") {
    val g = new Graft(spark)
    g.register(coll(fold = true))
    def run(w: Where) =
      g.get(GetParams("D", where = Some(w), properties = Seq("doc_id")))
        .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(run(Where.eqText("text", "café")) == Set(1L, 2L))
    assert(run(Where.like("text", "*sérver*")) == Set(1L, 2L))
  }
}
