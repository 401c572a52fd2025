package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Classify

/** Classify.naiveBayes vs an independent straight-line reimplementation of
 * the multinomial-NB model (priors, Laplace smoothing, OOV drop, tie rule)
 * — the same oracle style as ContextualClassifySpec. */
class NaiveBayesSpec extends SparkSpecBase {
  import spark.implicits._

  private val train = Seq(
    ("spam", "buy cheap pills"),
    ("spam", "cheap pills now now"),
    ("ham", "meeting notes attached"),
    ("ham", "project meeting tomorrow"))
  private val probes = Seq(
    (1L, "cheap meeting meeting"),
    (2L, "pills pills buy"),
    (3L, "zzz qqq"),        // fully out-of-vocabulary → priors only
    (4L, "...!!!"))         // no tokens at all → priors only, matched 0

  /** The model, straight-line driver-side. */
  private def replay(alpha: Double = 1.0): Map[Long, (String, Double, Long)] = {
    val tok = (s: String) => "[\\p{L}\\p{N}]+".r.findAllIn(s.toLowerCase).toSeq
    val t = train.map { case (l, s) => (l, tok(s)) }.filter(_._2.nonEmpty)
    val labels = t.map(_._1).distinct.sorted
    val nDocs = t.size.toDouble
    val vocab = t.flatMap(_._2).toSet
    val counts = labels.map { l =>
      val toks = t.filter(_._1 == l).flatMap(_._2)
      (l, toks.groupBy(identity).view.mapValues(_.size.toLong).toMap, toks.size.toLong)
    }
    probes.map { case (id, s) =>
      val ws = tok(s).filter(vocab)
      val scored = counts.map { case (l, wc, tot) =>
        val prior = math.log(t.count(_._1 == l) / nDocs)
        val lik = ws.map(w => math.log(
          (wc.getOrElse(w, 0L) + alpha) / (tot + alpha * vocab.size))).sum
        (l, prior + lik)
      }
      val (bl, bs) = scored.minBy { case (l, sc) => (-sc, l) }
      id -> ((bl, bs, ws.size.toLong))
    }.toMap
  }

  private def run() = Classify.naiveBayes(
    train.toDF("lbl", "txt"), col("txt"), col("lbl"),
    probes.toDF("id", "txt"), col("id"), col("txt"))

  test("matches the straight-line model: argmax, score, OOV drop, tie to smaller label") {
    val expect = replay()
    val got = run().collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (l, s, m)) =>
      val (el, es, em) = expect(id)
      assert(l == el, s"label for $id")
      assert(math.abs(s - es) < 1e-9, s"score for $id: $s vs $es")
      assert(m == em, s"matched for $id")
    }
    // OOV-only and token-less probes fall back to priors; 2-vs-2 docs tie
    // breaks to the smaller label
    assert(got(3L)._1 == "ham" && got(3L)._3 == 0L)
    assert(got(4L)._1 == "ham" && got(4L)._3 == 0L)
  }

  test("plan: equi-joins only, model pivoted to plan literals") {
    val plan = run().queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("guards: empty training set and oversized label sets are loud") {
    intercept[IllegalArgumentException] {
      Classify.naiveBayes(
        Seq.empty[(String, String)].toDF("lbl", "txt"), col("txt"), col("lbl"),
        probes.toDF("id", "txt"), col("id"), col("txt"))
    }
    intercept[IllegalArgumentException] {
      Classify.naiveBayes(
        (1 to 40).map(i => (s"l$i", s"word$i")).toDF("lbl", "txt"),
        col("txt"), col("lbl"),
        probes.toDF("id", "txt"), col("id"), col("txt"), maxLabels = 8)
    }
  }
}
