package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.engine.Collection
import graft.model.{Bm25, CollectionSchema, Property, PropType, SearchOperator, Tokenization}
import graft.operators.{Bm25Search, Postings}

/**
 * Property test: the postings-index BM25 path (incl. BlockMax-style pruning,
 * prop-subset serving and boosts) agrees with the literal-folded scan path on
 * random corpora and random queries — the bit-parity claim behind the
 * engine's scan-vs-index planner, tested adversarially rather than on a few
 * fixed queries. Docs may carry NULL props (the scan path must score the
 * remaining props, matching the postings path's no-rows semantics) and
 * queries may repeat terms (duplicateTextBoost on both paths). Result comparison is by the SET of (id, score@1e-9) with no
 * limit cut, so fp near-ties cannot flake the ordering.
 */
object PostingsParityProps extends Properties("PostingsParity") {

  // each case builds a postings index (several Spark jobs); keep the count
  // modest like ClusterProps
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private val vocab = Vector("spark", "join", "stream", "window", "scan",
    "merge", "table", "row", "batch", "filter")

  private case class Case(
      docs: List[(Long, Option[String], Option[String])],  // (id, body, tag) — None = null prop
      query: String,
      op: SearchOperator,
      k1: Double, b: Double,
      props: Seq[String],                  // scored subset
      boost: Double)

  private val caseGen: Gen[Case] = for {
    n     <- Gen.choose(20, 60)
    docs  <- Gen.listOfN(n, for {
      len  <- Gen.choose(0, 8)
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
      // null props: a doc may lack body and/or tag — the scan path must score
      // the non-null props normally (not null out the whole per-term sum),
      // exactly like the postings path where a null prop simply has no rows
      body <- Gen.frequency(4 -> Gen.const(Some(toks.mkString(" "))), 1 -> Gen.const(None))
      tag  <- Gen.frequency(4 -> Gen.some(Gen.oneOf(vocab)), 1 -> Gen.const(None))
    } yield (body, tag))
    qLen  <- Gen.choose(1, 4)
    q     <- Gen.listOfN(qLen, Gen.oneOf(vocab))
    and   <- Gen.oneOf(true, false)
    mm    <- Gen.choose(1, 2)
    k1    <- Gen.choose(0.5, 2.0)
    b     <- Gen.choose(0.0, 1.0)
    sub   <- Gen.oneOf(Seq("body"), Seq("tag"), Seq("body", "tag"))
    boost <- Gen.oneOf(1.0, 2.5)
  } yield Case(
    docs.zipWithIndex.map { case ((body, tag), i) => (i.toLong, body, tag) },
    q.mkString(" "),
    if (and) SearchOperator.AndOp else SearchOperator.Or(mm),
    k1, b, sub, boost)

  private val schema = CollectionSchema("P", "id", Seq(
    Property("body", PropType.Text, Tokenization.Word),
    Property("tag", PropType.Text, Tokenization.Word)))

  property("searchPruned == scan (random corpus/query/op/k1/b/subset/boost)") =
    forAll(caseGen) { cs =>
      val session = spark
      import session.implicits._
      val df = cs.docs.toDF("id", "body", "tag")
      val c = Collection(schema, df)
      val idx = Postings.build(c, Seq("body", "tag"), buckets = 8)
      val boosts = cs.props.map(p => p -> cs.boost).toMap
      val bmProps = cs.props.map(p => if (cs.boost == 1.0) p else s"$p^${cs.boost}")
      val n = cs.docs.size

      def key(rows: Array[(Long, Double)]): Set[(Long, Double)] =
        rows.map { case (id, s) => (id, math.rint(s * 1e9) / 1e9) }.toSet

      try {
        val scan = key(Bm25Search
          .search(c, Bm25(cs.query, bmProps, cs.op, cs.k1, cs.b), n)
          .select($"id", col(Bm25Search.ScoreCol))
          .collect().map(r => (r.getLong(0), r.getDouble(1))))
        val pruned = key(Postings
          .searchPruned(idx, cs.query, n, cs.op, cs.k1, cs.b,
            boosts = boosts, props = Some(cs.props))
          .select($"id", col(Bm25Search.ScoreCol))
          .collect().map(r => (r.getLong(0), r.getDouble(1))))
        val plain = key(Postings
          .search(idx, cs.query, n, cs.op, cs.k1, cs.b,
            boosts = boosts, props = Some(cs.props))
          .select($"id", col(Bm25Search.ScoreCol))
          .collect().map(r => (r.getLong(0), r.getDouble(1))))
        scan == pruned && scan == plain
      } finally {
        idx.postings.unpersist(); idx.docLens.unpersist()
        idx.termDf.unpersist(); idx.maxImpact.unpersist()
        Bm25Search.invalidateStats()
      }
    }
}
