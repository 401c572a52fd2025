package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dsir

class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  // raw corpus: 4 "science" docs (the target domain) + 4 "web spam" docs,
  // with disjoint vocabularies so the importance direction is unambiguous
  private def corpus = Seq(
    (1L, "quantum field theory predicts particle interactions precisely"),
    (2L, "quantum entanglement enables particle teleportation experiments"),
    (3L, "field experiments measure quantum interactions in particle physics"),
    (4L, "particle physics theory quantum experiments field measurements"),
    (5L, "click here buy cheap deals now limited offer"),
    (6L, "buy now cheap click offer deals here free"),
    (7L, "free deals click buy here now cheap offer"),
    (8L, "offer free cheap now click deals buy limited")
  ).toDF("id", "text")

  private def target = corpus.filter($"id" <= 2)

  test("train: complete B-row model, target-domain buckets score positive") {
    val m = Dsir.train(target, corpus, $"id", $"text", buckets = 128)
    assert(m.count() == 128)
    assert(m.columns.toSet == Set("bucket", "log_ratio"))
    // every bucket id in range, exactly once
    val ids = m.select($"bucket").collect().map(_.getLong(0))
    assert(ids.toSet == (0L until 128L).toSet)
  }

  test("logWeights: target-like docs outweigh off-target docs") {
    val m = Dsir.train(target, corpus, $"id", $"text", buckets = 128)
    val w = Dsir.logWeights(corpus, $"id", $"text", m, buckets = 128)
      .select($"id", $"dsir_logw")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sci = Seq(1L, 2L, 3L, 4L).map(w)
    val spam = Seq(5L, 6L, 7L, 8L).map(w)
    assert(sci.min > spam.max,
      s"science docs ($sci) must outweigh spam docs ($spam)")
  }

  test("logWeights: docs with no features get weight 0 and survive the join") {
    val withEmpty = corpus.unionByName(Seq((9L, "···")).toDF("id", "text"))
    val m = Dsir.train(target, withEmpty, $"id", $"text", buckets = 64)
    val w = Dsir.logWeights(withEmpty, $"id", $"text", m, buckets = 64)
    assert(w.count() == 9)
    val empty = w.filter($"id" === 9L).select($"dsir_logw").head().getDouble(0)
    assert(empty == 0.0)
  }

  test("resample: deterministic, k rows, biased toward high-weight docs") {
    val m = Dsir.train(target, corpus, $"id", $"text", buckets = 128)
    val w = Dsir.logWeights(corpus, $"id", $"text", m, buckets = 128)
    val s1 = Dsir.resample(w, $"id", $"dsir_logw", k = 4)
      .select($"id").collect().map(_.getLong(0)).toSet
    val s2 = Dsir.resample(w, $"id", $"dsir_logw", k = 4)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "md5-derived Gumbel noise must make resampling a pure function")
    assert(s1.size == 4)
    // the vocabularies are disjoint and weights are far apart, so the
    // bounded Gumbel noise cannot flip science below spam: the selected set
    // must be science-majority
    assert(s1.count(_ <= 4L) >= 3, s"expected science-dominated sample, got $s1")
  }

  test("logWeightsSelf: single-pass weights ≡ train + logWeights") {
    val m = Dsir.train(target, corpus, $"id", $"text", buckets = 128)
    val two = Dsir.logWeights(corpus, $"id", $"text", m, buckets = 128)
      .select($"id", $"dsir_logw")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val one = Dsir.logWeightsSelf(corpus, $"id", $"text", $"id" <= 2, buckets = 128)
      .select($"id", $"dsir_logw")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one.keySet == two.keySet)
    one.foreach { case (id, w) =>
      assert(math.abs(w - two(id)) < 1e-9, s"doc $id: $w vs ${two(id)}") }
  }

  test("resample: score = logw + gumbel(md5 uniform), reproducible arithmetic") {
    val m = Dsir.train(target, corpus, $"id", $"text", buckets = 128)
    val w = Dsir.logWeights(corpus, $"id", $"text", m, buckets = 128)
    val got = Dsir.resample(w, $"id", $"dsir_logw", k = 8, salt = "dsir")
      .select($"id", $"dsir_logw", $"dsir_score")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    got.foreach { case (id, logw, score) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}dsir".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967297.0
      val expected = logw - math.log(-math.log(u))
      assert(math.abs(score - expected) < 1e-9, s"doc $id: $score vs $expected")
    }
  }
}
