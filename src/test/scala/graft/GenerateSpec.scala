package graft

import org.apache.spark.sql.functions._

import graft.engine.{Collection, Graft}
import graft.model._
import graft.model.PropType._
import graft.operators.Generate

/** Generative search `_additional { generate }` (reference:
 * usecases/modulecomponents/additional/generate + the prompt templating in
 * usecases/modulecomponents/generative/generative.go:69-102). */
class GenerateSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkGraft: Graft = {
    val df = Seq(
      (1L, "alpha text", "en", 10),
      (2L, "beta text", "de", 20),
      (3L, null.asInstanceOf[String], "fr", 30)).toDF("id", "body", "lang", "n")
    new Graft(spark).register(Collection(CollectionSchema("D", "id", Seq(
      Property("body", Text), Property("lang", Text), Property("n", Int))), df))
  }

  test("singleResult templates {prop} per row; null property nulls the result") {
    val out = mkGraft.get(GetParams("D",
      pagination = Some(Pagination(limit = 10)),
      properties = Seq("id"),
      generate = Some(GenerateParams(singlePrompt = Some("[{lang}|{n}] {body}")))))
      .orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq === Seq(
      "[en|10] alpha text", "[de|20] beta text", null))
  }

  test("singleResult routes through a registered generative client") {
    val out = mkGraft.withGenerator(p => s"GEN(${p.length})")
      .get(GetParams("D",
        pagination = Some(Pagination(limit = 1)),
        properties = Seq("id"),
        generate = Some(GenerateParams(singlePrompt = Some("{lang}")))))
      .collect()
    assert(out.head.getString(1) === "GEN(2)")
  }

  test("non-echo client is never invoked with a null prompt (null-guarded UDF)") {
    // row 3's body is null → null prompt; an unguarded UDF would hand the
    // client null and this client would NPE on p.length
    val out = mkGraft.withGenerator(p => s"GEN(${p.length})")
      .get(GetParams("D",
        pagination = Some(Pagination(limit = 10)),
        properties = Seq("id"),
        generate = Some(GenerateParams(singlePrompt = Some("{body}")))))
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getString(1))).toSeq ===
      Seq(Some("GEN(10)"), Some("GEN(9)"), None))
  }

  test("groupedResult: one prompt over the page, attached to the first row") {
    val out = mkGraft.get(GetParams("D",
      pagination = Some(Pagination(limit = 2)),
      properties = Seq("id"),
      generate = Some(GenerateParams(
        groupedTask = Some("Digest {lang} and {missing}"),
        groupedProperties = Seq("lang", "body")))))
      .orderBy("id").collect()
    // {lang} from the first row; {missing} keeps its name (generative.go:74-82);
    // JSON keys sorted (body < lang), rows in page order
    assert(out(0).getString(1) ===
      """Digest en and missing: [{"body":"alpha text","lang":"en"},{"body":"beta text","lang":"de"}]""")
    assert(out(1).isNullAt(1))
  }

  test("groupedResult drops all-null rows from the JSON, like the reference") {
    val out = mkGraft.get(GetParams("D",
      pagination = Some(Pagination(limit = 3)),
      properties = Seq("id"),
      generate = Some(GenerateParams(
        groupedTask = Some("t"),
        groupedProperties = Seq("body")))))
      .orderBy("id").collect()
    // the third row's only selected property is null → its empty map is
    // filtered out entirely (generative.Texts drops empty Text maps)
    assert(out(0).getString(1) ===
      """t: [{"body":"alpha text"},{"body":"beta text"}]""")
  }

  test("groupedResult without a bounded page fails loudly") {
    val e = intercept[IllegalArgumentException] {
      mkGraft.get(GetParams("D",
        properties = Seq("id"),
        generate = Some(GenerateParams(groupedTask = Some("t")))))
    }
    assert(e.getMessage.contains("bounded page"))
  }

  test("unknown {prop} in singlePrompt fails at plan time") {
    val e = intercept[IllegalArgumentException] {
      mkGraft.get(GetParams("D",
        pagination = Some(Pagination(limit = 1)),
        generate = Some(GenerateParams(singlePrompt = Some("{nope}")))))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("JSON escaping matches Go json.Marshal (quotes, control, HTML chars)") {
    val df = Seq((1L, "a\"b\\c\nd<e>&")).toDF("id", "body")
    val g = new Graft(spark).register(Collection(CollectionSchema("E", "id",
      Seq(Property("body", Text))), df))
    val out = g.get(GetParams("E",
      pagination = Some(Pagination(limit = 1)),
      properties = Seq("id"),
      generate = Some(GenerateParams(groupedTask = Some("t"),
        groupedProperties = Seq("body"))))).collect()
    assert(out.head.getString(1) ===
      "t: [{\"body\":\"a\\\"b\\\\c\\nd\\u003ce\\u003e\\u0026\"}]")
  }
}
