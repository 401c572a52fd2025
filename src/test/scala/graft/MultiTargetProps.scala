package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.ann.IvfIndex
import graft.engine.Collection
import graft.model._

/** Model-based check of the multi-target index arm: `IvfIndex
 * .multiTargetSearch` (union of per-target candidate lists, exact backfill,
 * combine — the Spark shape of the reference's CombineMultiTargetResults,
 * shard_combine_multi_target.go:89-260) must equal a driver-side reference
 * model for EVERY combination (Min/Sum/Avg/Manual/RelativeScore); the DuckDB
 * oracle only pins Sum. Single-centroid indexes make every probe an exact
 * full scan, so the per-target candidate lists — and hence the model — are
 * deterministic. Small-integer coordinates force exact distance ties, so the
 * (distance, id) tie-breaks are exercised without float-ULP ambiguity. */
object MultiTargetProps extends Properties("MultiTarget") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = TestSpark.spark

  private case class TCase(
      docs: List[(Long, Seq[Float], Seq[Float])],
      query: Array[Float],
      queryB: Option[Array[Float]],   // per-target query vectors when set
      k: Int,
      comb: TargetCombination)

  private val coord: Gen[Float] = Gen.choose(0, 4).map(_.toFloat)
  private def vec(dim: Int): Gen[Seq[Float]] = Gen.listOfN(dim, coord).map(_.toSeq)

  private val combGen: Gen[TargetCombination] = Gen.oneOf(
    Gen.const(TargetCombination.Minimum),
    Gen.const(TargetCombination.Sum),
    Gen.const(TargetCombination.Average),
    for { w1 <- Gen.choose(0.0, 3.0); w2 <- Gen.choose(0.0, 3.0) }
      yield TargetCombination.ManualWeights(Seq(w1, w2)),
    for { w1 <- Gen.choose(0.1, 3.0); w2 <- Gen.choose(0.1, 3.0) }
      yield TargetCombination.RelativeScore(Seq(w1, w2)))

  private val caseGen: Gen[TCase] = for {
    dim  <- Gen.choose(2, 4)
    n    <- Gen.choose(12, 40)
    docs <- Gen.listOfN(n, for { va <- vec(dim); vb <- vec(dim) } yield (va, vb))
    q    <- vec(dim)
    qb   <- Gen.option(vec(dim))
    k    <- Gen.choose(2, 8)
    comb <- combGen
  } yield TCase(docs.zipWithIndex.map { case ((va, vb), i) => (i.toLong, va, vb) },
    q.toArray, qb.map(_.toArray), k, comb)

  private def l2(a: Seq[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum

  /** Reference model: per-target exact top-k lists (distance, id asc), union
   * pool, every pool member backfilled with both exact distances, combined,
   * ranked (combined asc, id asc), truncated to k. */
  private def model(tc: TCase): Seq[Long] = {
    val d0 = tc.docs.map { case (id, va, _) => id -> l2(va, tc.query) }.toMap
    val qB = tc.queryB.getOrElse(tc.query)
    val d1 = tc.docs.map { case (id, _, vb) => id -> l2(vb, qB) }.toMap
    def topK(d: Map[Long, Double]): Seq[Long] =
      d.toSeq.sortBy { case (id, dist) => (dist, id) }.take(tc.k).map(_._1)
    val pool = (topK(d0) ++ topK(d1)).distinct
    val combined: Map[Long, Double] = tc.comb match {
      case TargetCombination.Minimum => pool.map(id => id -> math.min(d0(id), d1(id))).toMap
      case TargetCombination.Sum     => pool.map(id => id -> (d0(id) + d1(id))).toMap
      case TargetCombination.Average => pool.map(id => id -> (d0(id) + d1(id)) / 2).toMap
      case TargetCombination.ManualWeights(ws) =>
        pool.map(id => id -> (d0(id) * ws(0) + d1(id) * ws(1))).toMap
      case TargetCombination.RelativeScore(ws) =>
        val (mn0, mx0) = (pool.map(d0).min, pool.map(d0).max)
        val (mn1, mx1) = (pool.map(d1).min, pool.map(d1).max)
        def norm(d: Double, mn: Double, mx: Double, w: Double): Double =
          if (mx == mn) w else (d - mn) / (mx - mn) * w
        pool.map(id => id ->
          (norm(d0(id), mn0, mx0, ws(0)) + norm(d1(id), mn1, mx1, ws(1)))).toMap
    }
    pool.sortBy(id => (combined(id), id)).take(tc.k)
  }

  /** A one-centroid "index": probing is an exact full scan of the layout. */
  private def trivialIndex(df: org.apache.spark.sql.DataFrame, vecCol: String,
                           dim: Int): IvfIndex =
    IvfIndex(Array((0, Array.fill(dim)(0.0))), df.withColumn("__centroid", lit(0)),
      vecCol, "id", replicas = 1, defaultNprobe = 1)

  property("multiTargetSearch == reference model for every combination") = forAll(caseGen) { tc =>
    val session = spark
    import session.implicits._
    val df = tc.docs.toDF("id", "va", "vb")
      .withColumn("va", col("va").cast("array<float>"))
      .withColumn("vb", col("vb").cast("array<float>"))
    val schema = CollectionSchema("T", "id", Seq.empty,
      vectors = Map("a" -> "va", "b" -> "vb"), defaultVector = Some("a"))
    val c = Collection(schema, df)
    val params = NearVector(tc.query, Metric.L2Squared,
      targetVectors = Seq("a", "b"), combination = tc.comb,
      vectors = tc.queryB.map(qb => TargetQuery.singles(Seq(tc.query, qb))).getOrElse(Nil))
    val got = IvfIndex.multiTargetSearch(c, Seq("a", "b"),
      Seq(trivialIndex(df, "va", tc.query.length), trivialIndex(df, "vb", tc.query.length)),
      params, tc.k, None)
      .select($"id").collect().map(_.getLong(0)).toSeq
    val want = model(tc)
    if (got != want)
      println(s"[multitarget-prop] comb=${tc.comb} k=${tc.k} got=$got want=$want")
    got == want
  }
}
