package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.engine.Graft
import graft.model._
import graft.operators.{Ner, Qna, Summarize}

class SummarizeQnaSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val g: Graft = {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old windmill", "short title"),
      (2L, "plain prose with nothing of note inside it at all", ""),
      (3L, null.asInstanceOf[String], "only a title here")
    ).toDF("id", "body", "title")
    new Graft(spark).register(CollectionSchema("Doc", "id", Seq(
      Property("body", PropType.Text),
      Property("title", PropType.Text))), df)
  }

  test("summary: one {property, result} entry per requested non-empty text prop") {
    val got = g.get(GetParams("Doc",
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"),
      summary = Some(SummaryParams(Seq("body", "title"))),
      additional = Set("summary")))
      .select($"id", col(Summarize.Col))
      .collect().map(r => r.getLong(0) -> r.getSeq[Row](1)).toMap
    // doc 1: both props non-empty → two entries in REQUESTED order
    assert(got(1L).map(_.getString(0)) == Seq("body", "title"))
    assert(got(1L).head.getString(1).startsWith("the quick brown fox"))
    // doc 2: empty title contributes nothing
    assert(got(2L).map(_.getString(0)) == Seq("body"))
    // doc 3: null body skipped, title kept
    assert(got(3L).map(_.getString(0)) == Seq("title"))
    assert(got(3L).head.getString(1) == "only a title here")
  }

  test("summary: requesting no properties / non-text properties errors") {
    intercept[IllegalArgumentException] { SummaryParams(Nil) }
    val e = intercept[IllegalArgumentException] {
      g.get(GetParams("Doc", summary = Some(SummaryParams(Seq("nope")))))
    }
    assert(e.getMessage.contains("unknown summary property"))
  }

  test("answer: extractive stand-in finds the term window and localizes the span") {
    val got = g.get(GetParams("Doc",
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"),
      ask = Some(AskParams("at the windmill", Seq("body"))), // at/the are stopwords → term "windmill"
      additional = Set("answer")))
      .select($"id", col(Qna.Col))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val a1 = got(1L)
    assert(a1.getBoolean(4)) // has_answer
    assert(a1.getString(0).startsWith("windmill"))
    assert(a1.getString(1) == "body")
    // start = 0-based index of "windmill" in the lowercased body
    val body1 = "the quick brown fox jumps over the lazy dog near the old windmill"
    assert(a1.getLong(2) == body1.indexOf("windmill").toLong)
    assert(a1.getLong(3) == a1.getLong(2) + a1.getString(0).length)
    // doc 2 lacks the term → hasAnswer=false, null fields
    val a2 = got(2L)
    assert(!a2.getBoolean(4) && a2.isNullAt(0) && a2.isNullAt(2))
    // doc 3: null body → passage empty → no answer
    assert(!got(3L).getBoolean(4))
  }

  test("answer: multi-prop passage joins declared order and localizes to the right prop") {
    val got = g.get(GetParams("Doc",
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"),
      ask = Some(AskParams("the title")), // properties empty = all text props; term "title"
      additional = Set("answer")))
      .select($"id", col(Qna.Col))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    // "title" first occurs in doc 1's TITLE prop ("short title"); the
    // passage is "body title", so the window crosses into title's value and
    // findProperty reports the first prop CONTAINING the whole window —
    // here the window starts inside title, so property = title
    val a1 = got(1L)
    assert(a1.getBoolean(4))
    assert(a1.getString(1) == "title")
    assert(a1.getLong(2) == "short ".length.toLong)
    // doc 3's only text is the title
    val a3 = got(3L)
    assert(a3.getBoolean(4))
    assert(a3.getString(0).startsWith("title here"))
    assert(a3.getString(1) == "title")
  }

  test("tokens: gazetteer entries, certainty cutoff, cross-property limit") {
    val gz = g.withNerClient(Ner.dictionary(Seq(
      Ner.DictEntry("fox", "ANIMAL", 0.9),
      Ner.DictEntry("dog", "ANIMAL", 0.8),
      Ner.DictEntry("windmill", "LOC", 0.6),
      Ner.DictEntry("title", "MISC", 0.95))))
    def tokens(np: NerParams): Map[Long, Seq[(String, String, Long)]] =
      gz.get(GetParams("Doc",
        pagination = Some(Pagination(limit = 10)),
        properties = Seq("id"),
        ner = Some(np), additional = Set("tokens")))
        .select($"id", col(Ner.Col))
        .collect().map(r => r.getLong(0) -> r.getSeq[Row](1)
          .map(t => (t.getString(1), t.getString(3), t.getLong(4)))).toMap
    val all = tokens(NerParams(Seq("body", "title")))
    // doc 1 body: fox, dog, windmill in dictionary order with real offsets
    assert(all(1L).map(_._2) == Seq("fox", "dog", "windmill", "title"))
    assert(all(1L).head ==
      (("ANIMAL", "fox", "the quick brown fox".indexOf("fox").toLong)))
    // the "title" hit comes from the SECOND property (title prop)
    // doc 3: null body skipped, title prop yields its token
    assert(all(3L).map(_._2) == Seq("title"))
    // certainty 0.7 drops windmill (0.6)
    val cut = tokens(NerParams(Seq("body", "title"), certainty = Some(0.7)))
    assert(cut(1L).map(_._2) == Seq("fox", "dog", "title"))
    // limit 2 truncates the accumulated list
    val lim = tokens(NerParams(Seq("body", "title"), limit = Some(2)))
    assert(lim(1L).map(_._2) == Seq("fox", "dog"))
  }

  test("spellCheck: query-scoped entry with didYouMean, location, per-change records") {
    val withFix = g.withSpellchecker(w =>
      Map("qick" -> "quick", "fxo" -> "fox").getOrElse(w, w))
    val got = withFix.get(GetParams("Doc",
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"),
      ask = Some(AskParams("the qick brown fxo", Seq("body"))),
      additional = Set("spellCheck")))
      .select($"id", col(graft.operators.SpellChecks.Col))
      .collect()
    assert(got.length == 3) // attaches to every row
    val sc = got.head.getSeq[Row](1)
    assert(sc.length == 1) // one entry per query text (ask has one)
    val e = sc.head
    assert(e.getString(0) == "the qick brown fxo")
    assert(e.getString(1) == "the quick brown fox")
    assert(e.getString(2) == "ask.question")
    assert(e.getSeq[Row](3).map(ch => (ch.getString(0), ch.getString(1))) ==
      Seq(("qick", "quick"), ("fxo", "fox")))
    // identical entry on every row (query-scoped)
    assert(got.forall(_.getSeq[Row](1) == sc))
    // nearText variant gets indexed concept locations (vector-ed collection)
    val emb = Fixtures.hashEmbedder(16)
    val gv = new Graft(spark).withEmbedder(emb)
      .withSpellchecker(w => Map("qick" -> "quick").getOrElse(w, w))
    val vdf = Seq((1L, "alpha", emb("alpha")), (2L, "beta", emb("beta")))
      .toDF("id", "body", "vec")
    gv.register(CollectionSchema("DocV", "id", Seq(Property("body", PropType.Text)),
      vectors = Map("default" -> "vec"), defaultVector = Some("default")), vdf)
    val nt = gv.get(GetParams("DocV",
      nearText = Some(NearText(Seq("qick", "plain"))),
      pagination = Some(Pagination(limit = 2)),
      properties = Seq("id"),
      additional = Set("spellCheck")))
      .select(col(graft.operators.SpellChecks.Col)).head().getSeq[Row](0)
    assert(nt.map(_.getString(2)) == Seq("nearText.concepts[0]", "nearText.concepts[1]"))
    assert(nt.head.getString(1) == "quick")
  }

  test("answer: only-stopword question errors; custom client overrides the stand-in") {
    intercept[IllegalArgumentException] {
      g.get(GetParams("Doc", ask = Some(AskParams("the of and"))))
        .collect()
    }
    val custom = g.withQnaClient((_, q) => lit(s"canned:$q"))
    val got = custom.get(GetParams("Doc",
      pagination = Some(Pagination(limit = 1)),
      properties = Seq("id"),
      ask = Some(AskParams("anything", Seq("body"))),
      additional = Set("answer")))
      .select(col(Qna.Col).getField("result")).head().getString(0)
    assert(got == "canned:anything")
  }
}
