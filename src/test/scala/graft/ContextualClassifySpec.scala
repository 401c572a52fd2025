package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Classify

/** Classify.contextual vs an independent per-item reimplementation of the
 * reference loop (classifier_run_contextual.go + tf_idf.go), the same
 * oracle style as DedupSpec-vs-brute-force. */
class ContextualClassifySpec extends SparkSpecBase {
  import spark.implicits._

  private val embed = Fixtures.hashEmbedder(16)
  private val targets = Seq(
    "analytics" -> embed("table scan query"),
    "streaming" -> embed("stream window batch"),
    "commerce"  -> embed("customer order"))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    1.0 - dot / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
  }

  /** The reference loop, straight-line (per item, driver-side). */
  private def replay(docs: Seq[(Long, String)], minWords: Int = 3, igPct: Int = 50,
                     maxBoost: Double = 3.0, tfPct: Int = 80,
                     clamp: Boolean = true): Map[Long, (String, Double)] = {
    val tokenized = docs.map { case (id, t) =>
      (id, "[\\p{L}\\p{N}]+".r.findAllIn(t.toLowerCase).toSeq)
    }.filter(_._2.nonEmpty)
    val n = tokenized.size
    val docsContaining = tokenized.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size)
    def idf(w: String) = math.log10(n.toDouble / docsContaining(w))
    tokenized.map { case (id, words) =>
      def tfidf(w: String) = words.count(_ == w).toDouble / words.size * idf(w)
      def ig(w: String) = {
        val ds = targets.map { case (_, tv) => cos(embed(w), tv) }
        ds.sum / ds.size - ds.min
      }
      val distinct = words.distinct
      val rankedIg = distinct.sortBy(w => (-ig(w), w))
      val cutIg = (igPct / 100.0 * rankedIg.size).toInt
      val rankedTf = distinct.sortBy(w => (-tfidf(w), w))
      val cutTf = (tfPct / 100.0 * rankedTf.size).toInt
      val igSet = rankedIg.take(cutIg).toSet
      val tfSet = rankedTf.take(cutTf).toSet
      val boosts = rankedIg.take(cutIg).zipWithIndex.map { case (w, i) =>
        w -> (if (i == 0) maxBoost
              else {
                val raw = 1 - math.log(i.toDouble / cutIg)
                if (clamp) math.min(maxBoost, raw) else raw
              })
      }.toMap
      var corpus = words.filter(w => igSet(w) && tfSet(w))
      if (corpus.size < minWords) corpus = rankedIg.take(minWords)
      val dim = embed("x").length
      val s = new Array[Double](dim)
      corpus.foreach { w =>
        val v = embed(w); val b = boosts.getOrElse(w, 1.0)
        (0 until dim).foreach(i => s(i) += b * v(i))
      }
      val nrm = math.sqrt(s.map(x => x * x).sum)
      if (nrm == 0) None // unclassifiable (zero corpus vector) — engine drops
      else {
        val best = targets.map { case (t, tv) =>
          val dot = (0 until dim).map(i => s(i) * tv(i)).sum
          val d = 1.0 - dot / (nrm * math.sqrt(tv.map(x => x.toDouble * x).sum))
          (d, t)
        }.min
        Some(id -> (best._2, best._1))
      }
    }.flatten.toMap
  }

  test("contextual classification matches the per-item reference replay") {
    val docs = Seq(
      (1L, "stream window stream batch table"),
      (2L, "customer order customer order order table"),
      (3L, "table scan query scan table scan window"),
      (4L, "stream batch window window batch customer scan query table order"),
      (5L, "query"),              // 1 distinct word → cutoffs 0 → fallback path
      (6L, "scan scan customer"), // small doc, fallback likely
      (7L, "   "))                // no words → dropped
    val got = Classify.contextual(docs.toDF("id", "text"), $"id", $"text",
        targets, embed)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val expected = replay(docs)
    assert(got.keySet == expected.keySet && !got.contains(7L))
    got.foreach { case (id, (t, d)) =>
      assert(t == expected(id)._1, s"doc $id predicted $t, replay says ${expected(id)._1}")
      assert(math.abs(d - expected(id)._2) < 1e-9, s"doc $id distance")
    }
  }

  test("settings thread through: percentiles, boost cap, minimum words") {
    val docs = Seq(
      (1L, "stream window batch table scan query customer order stream stream"))
    for ((mw, ig, mb, tf) <- Seq((1, 30, 2.0, 50), (5, 80, 10.0, 100), (2, 0, 3.0, 0))) {
      val got = Classify.contextual(docs.toDF("id", "text"), $"id", $"text",
          targets, embed, minimumUsableWords = mw, igCutoffPercentile = ig,
          igMaximumBoost = mb, tfidfCutoffPercentile = tf)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      val expected = replay(docs, mw, ig, mb, tf)
      assert(got.keySet == expected.keySet, s"settings ($mw,$ig,$mb,$tf) row sets")
      expected.foreach { case (id, (t, d)) =>
        assert(got(id)._1 == t, s"settings ($mw,$ig,$mb,$tf)")
        assert(math.abs(got(id)._2 - d) < 1e-9, s"settings ($mw,$ig,$mb,$tf)")
      }
    }
  }

  test("the ln-decay boost clamp at igMaximumBoost binds on wide docs " +
      "(boostByInformationGain caps at 3.0)") {
    // 18 distinct words → cutIg = 9, so rank 2's raw decay 1 − ln(1/9)
    // ≈ 3.197 exceeds the 3.0 cap. The 12-word driver beds can never reach
    // this branch (cutIg <= 6 keeps every decay under the cap), so this is
    // the one gate where the least() clamp is load-bearing.
    val wide = Seq((1L, "stream window batch table scan query customer order " +
      "spark join merge filter vector data hash sort group key"))
    assert(1.0 - math.log(1.0 / 9.0) > 3.0, "bed must push rank 2 over the cap")
    val capped = Classify.contextual(wide.toDF("id", "text"), $"id", $"text",
        targets, embed)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val expected = replay(wide)
    assert(capped(1L)._1 == expected(1L)._1)
    assert(math.abs(capped(1L)._2 - expected(1L)._2) < 1e-9)
    // discrimination proof: the UNCLAMPED replica diverges on this bed, so
    // an engine missing the least() cap cannot match the capped replay
    val unclamped = replay(wide, clamp = false)
    assert(math.abs(unclamped(1L)._2 - expected(1L)._2) > 1e-9,
      "unclamped decay must change the distance — otherwise the clamp never fired")
  }

  test("plan shape: no cartesian, windows doc-partitioned, word UDF off the row path") {
    val docs = (0L until 50L).map(i => (i, s"stream window batch w$i table")).toDF("id", "text")
    val plan = Classify.contextual(docs, $"id", $"text", targets, embed)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
