package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.engine.Graft
import graft.model._

/**
 * Property test: the FilterCompiler's Column compilation agrees with a
 * direct Scala evaluation of the clause tree under SQL three-valued logic
 * (the bitmap-vs-predicate equivalence the reference relies on —
 * SURVEY §5 test-strategy adoption (d)).
 */
object FilterAlgebraProps extends Properties("FilterAlgebra") {

  private lazy val spark = TestSpark.spark

  private case class P(id: Long, name: String, age: Option[Long], tags: Seq[String], dept: String)

  private val rows = Seq(
    P(1, "alice smith", Some(30), Seq("scala", "spark"), "eng"),
    P(2, "bob jones", Some(25), Seq("ads"), "mkt"),
    P(3, "carol smith", None, Seq("spark", "sql"), "eng"),
    P(4, "dave brown", Some(40), Seq.empty, "sales"),
    P(5, "erin smith jones", Some(30), Seq("spark"), "mkt"),
    P(6, "frank", None, Seq("scala", "sql", "ads"), "sales"))

  private lazy val g: Graft = {
    val session = spark
    import session.implicits._
    val df = rows.toDF()
    // the generators emit IsNull and len() leaves, which the reference gates
    // behind class-level inverted-index opt-ins — this collection opts in
    new Graft(spark).register(CollectionSchema("P", "id", Seq(
      Property("name", PropType.Text, Tokenization.Word),
      Property("age", PropType.Int),
      Property("tags", PropType.Arr(PropType.Text)),
      Property("dept", PropType.Text, Tokenization.Field)),
      invertedIndex = InvertedIndexConfig(indexNullState = true, indexPropertyLength = true)), df)
  }

  // --- generators -----------------------------------------------------------

  private val words = Gen.oneOf("alice", "smith", "jones", "bob", "spark", "zzz")
  private val tagVals = Gen.oneOf("scala", "spark", "sql", "ads", "none")
  private val depts = Gen.oneOf("eng", "mkt", "sales", "hr")

  private val leaf: Gen[Where] = Gen.oneOf(
    words.map(w => Where.eqText("name", w)),
    words.map(w => Where.neText("name", w)),
    Gen.chooseNum(20L, 45L).map(v => Where.gtInt("age", v)),
    Gen.chooseNum(20L, 45L).map(v => Where.leInt("age", v)),
    Gen.oneOf(true, false).map(v => Where.isNull("age", v)),
    depts.map(d => Where.eqText("dept", d)),
    Gen.nonEmptyListOf(tagVals).map(vs => Where.containsAnyText("tags", vs.distinct)),
    Gen.nonEmptyListOf(tagVals).map(vs => Where.containsAllText("tags", vs.distinct)),
    Gen.nonEmptyListOf(tagVals).map(vs => Where.containsNoneText("tags", vs.distinct)),
    Gen.chooseNum(1L, 20L).map(v => Where.gtInt("len(name)", v)),
    Gen.oneOf("*smith*", "a*", "??b*", "*s").map(p => Where.like("name", p)))

  private def tree(depth: Int): Gen[Where] =
    if (depth == 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> Gen.listOfN(2, tree(depth - 1)).map(ws => Where.and(ws: _*)),
      2 -> Gen.listOfN(2, tree(depth - 1)).map(ws => Where.or(ws: _*)),
      1 -> tree(depth - 1).map(Where.not))

  // --- Scala oracle under Kleene three-valued logic -------------------------

  private def tokens(s: String): Seq[String] = "[\\p{L}\\p{N}]+".r.findAllIn(s.toLowerCase).toSeq

  private def evalLeaf(p: P, w: Where): Option[Boolean] = {
    import FilterValue._
    val path = w.path.head
    (path, w.op) match {
      case ("name", WhereOp.Equal) =>
        val TextV(v) = w.value.get: @unchecked
        Some(tokens(v).forall(t => tokens(p.name).contains(t)) && tokens(v).nonEmpty)
      case ("name", WhereOp.NotEqual) =>
        // per-term NotEqual children joined by And (searcher.go:938):
        // NONE of the value's terms may appear
        val TextV(v) = w.value.get: @unchecked
        Some(tokens(v).nonEmpty && tokens(v).forall(t => !tokens(p.name).contains(t)))
      case ("name", WhereOp.Like) =>
        val TextV(pat) = w.value.get: @unchecked
        val regex = "^" + java.util.regex.Pattern.quote(pat)
          .replace("?", "\\E.\\Q").replace("*", "\\E.*\\Q") + "$"
        Some(p.name.matches(regex))
      case ("age", WhereOp.IsNull) =>
        val BoolV(wantNull) = w.value.get: @unchecked
        Some(if (wantNull) p.age.isEmpty else p.age.nonEmpty)
      case ("age", WhereOp.GreaterThan) =>
        val IntV(v) = w.value.get: @unchecked
        p.age.map(_ > v)
      case ("age", WhereOp.LessThanEqual) =>
        val IntV(v) = w.value.get: @unchecked
        p.age.map(_ <= v)
      case ("dept", WhereOp.Equal) =>
        val TextV(v) = w.value.get: @unchecked
        Some(p.dept == v)
      case ("tags", WhereOp.ContainsAny) =>
        val ListV(vs) = w.value.get: @unchecked
        Some(vs.exists { case TextV(v) => p.tags.contains(v); case _ => false })
      case ("tags", WhereOp.ContainsAll) =>
        val ListV(vs) = w.value.get: @unchecked
        Some(vs.forall { case TextV(v) => p.tags.contains(v); case _ => false })
      case ("tags", WhereOp.ContainsNone) =>
        val ListV(vs) = w.value.get: @unchecked
        Some(!vs.exists { case TextV(v) => p.tags.contains(v); case _ => false })
      case ("len(name)", WhereOp.GreaterThan) =>
        val IntV(v) = w.value.get: @unchecked
        Some(p.name.length > v)
      case other => throw new MatchError(s"oracle gap: $other")
    }
  }

  private def eval(p: P, w: Where): Option[Boolean] = w.op match {
    case WhereOp.And =>
      val vs = w.operands.map(eval(p, _))
      if (vs.contains(Some(false))) Some(false)
      else if (vs.contains(None)) None else Some(true)
    case WhereOp.Or =>
      val vs = w.operands.map(eval(p, _))
      if (vs.contains(Some(true))) Some(true)
      else if (vs.contains(None)) None else Some(false)
    case WhereOp.Not => eval(p, w.operands.head).map(!_)
    case _ => evalLeaf(p, w)
  }

  // --- the property ---------------------------------------------------------

  property("compiled filter == three-valued predicate oracle") =
    forAll(tree(3)) { w =>
      val got = g.get(GetParams("P", where = Some(w), properties = Seq("id")))
        .collect().map(_.getLong(0)).toSet
      val want = rows.filter(p => eval(p, w).contains(true)).map(_.id).toSet
      if (got != want) {
        println(s"MISMATCH for $w\n got=$got want=$want")
      }
      got == want
    }
}
