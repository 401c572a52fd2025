package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Curate, Decontaminate}

class CurateSpec extends SparkSpecBase {
  import spark.implicits._

  test("stratifiedTopK: per-stratum quota, order + id tie-break, rank emitted") {
    val df = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.9), ("en", 3L, 0.5),
      ("de", 4L, 0.7), ("de", 5L, 0.8)
    ).toDF("lang", "id", "q")
    val got = Curate.stratifiedTopK(df, Seq($"lang"), $"q", $"id", k = 2)
      .select($"lang", $"id", $"sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // en: ids 1,2 tie on 0.9 → id asc breaks; de: 5 (0.8) then 4 (0.7)
    assert(got == Set(("en", 1L, 1), ("en", 2L, 2), ("de", 5L, 1), ("de", 4L, 2)))
  }

  test("packByTokenBudget: contiguous fill per shard, straddlers keep start bin") {
    val df = Seq(
      ("s1", 1L, 600L), ("s1", 2L, 600L), ("s1", 3L, 600L), ("s1", 4L, 600L),
      ("s2", 5L, 100L)
    ).toDF("source", "id", "nt")
    val got = Curate.packByTokenBudget(df, Seq($"source"), $"id", $"nt", budget = 1000L)
      .select($"id", $"bin_offset", $"bin")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // offsets 0,600,1200,1800 → bins 0,0,1,1; doc 2 straddles 1000 but starts in bin 0
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((600L, 0L)))
    assert(got(3L) == ((1200L, 1L)) && got(4L) == ((1800L, 1L)))
    assert(got(5L) == ((0L, 0L))) // fresh running total per shard
  }

  test("decontaminate: planted benchmark copy flags with full overlap; clean doc does not") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven"),
      (3L, "totally unrelated words nothing shared here at all")
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("alpha beta gamma delta epsilon zeta eta theta")).toDF("text")
    val got = Decontaminate.ngramOverlap(corpus, $"doc_id", $"text", bench, $"text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.contains(1L) && got(1L) == 4L) // 8 tokens → 4 distinct 5-grams, all shared
    assert(!got.contains(2L) && !got.contains(3L))
  }

  test("decontaminate: short docs (< n tokens) flag via the whole-text gram") {
    val corpus = Seq((1L, "tiny doc"), (2L, "other thing")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("tiny doc")).toDF("text")
    val got = Decontaminate.ngramOverlap(corpus, $"doc_id", $"text", bench, $"text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L))
  }

  test("mixtureSample: deterministic per-id draws, boundary rates, approximate target rate") {
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    // rate 1 keeps everything, rate 0 keeps nothing
    assert(Curate.mixtureSample(docs, $"id", lit(1.0)).count() == 1000L)
    assert(Curate.mixtureSample(docs, $"id", lit(0.0)).count() == 0L)
    // per-source mixture: half-rate on 'a', full on 'b'
    val rate = when($"src" === "a", 0.5).otherwise(lit(1.0))
    val got = Curate.mixtureSample(docs, $"id", rate)
    val aKept = got.filter($"src" === "a").count()
    assert(got.filter($"src" === "b").count() == 500L)
    assert(aKept > 200 && aKept < 300, s"~50% of the 500 'a' rows expected, got $aKept")
    // determinism: same ids survive regardless of partitioning or run
    val ids1 = got.select($"id").collect().map(_.getLong(0)).toSet
    val ids2 = Curate.mixtureSample(docs.repartition(13), $"id", rate)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // salt changes the draw
    val salted = Curate.mixtureSample(docs, $"id", rate, salt = "other")
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(salted != ids1)
  }

  test("hashSplit: exhaustive cover, weight normalization, incremental stability") {
    val docs = (0L until 1000L).map(Tuple1(_)).toDF("id")
    val got = Curate.hashSplit(docs, $"id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    val byId = got.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId.size == 1000, "every row gets exactly one split")
    val counts = byId.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900, counts.toString)
    assert(counts("val") > 50 && counts("val") < 160, counts.toString)
    assert(counts("test") > 50 && counts("test") < 160, counts.toString)
    // unnormalized weights ≡ normalized weights
    val norm = Curate.hashSplit(docs, $"id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(norm == byId)
    // incremental stability: adding rows never re-deals earlier rows
    val more = (0L until 2000L).map(Tuple1(_)).toDF("id")
    val grown = Curate.hashSplit(more, $"id",
        Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
      .filter($"id" < 1000).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(grown == byId)
  }

  test("clusterBalanced: per-cluster quota keeps the most representative rows") {
    // two tight clusters around orthogonal axes; seeds = ids 1,2 → one each
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(0.8f, 0.2f)),
      (5L, Seq(0.1f, 0.9f)), (6L, Seq(0.2f, 0.8f)),
      (7L, Seq(0.95f, 0.05f))
    ).toDF("id", "vec")
    val got = Curate.clusterBalanced(df, $"id", $"vec", k = 2, perCluster = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(3))).toMap
    // cluster 0 (x-axis): csim 1>.9986(#7)>.9939(#3)>.9701(#4) → keep 1,7
    // cluster 1 (y-axis): 2, then 5 — quota drops 3,4,6
    assert(got.keySet == Set(1L, 2L, 5L, 7L))
    assert(got(1L) == ((0, 1)) && got(7L) == ((0, 2)))
    assert(got(2L) == ((1, 1)) && got(5L) == ((1, 2)))
    // deterministic under re-partitioning
    val again = Curate.clusterBalanced(df.repartition(5), $"id", $"vec", 2, 2)
      .collect().map(_.getLong(0)).toSet
    assert(again == got.keySet)
  }

  test("temperatureRates: rarest domain keeps rate 1, head thins by p^(τ−1), τ=1 is identity") {
    val df = (0L until 100L).map(i => (i, if (i < 80) "head" else "tail")).toDF("id", "dom")
    val r = Curate.temperatureRates(df, $"dom", tau = 0.5)
      .select($"dom", $"mix_rate").distinct()
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("tail") == 1.0)
    // head rate = (80^-0.5)/(20^-0.5) = sqrt(20/80) = 0.5
    assert(math.abs(r("head") - 0.5) < 1e-12)
    // τ=1 → no re-weighting: every domain keeps rate 1
    val flat = Curate.temperatureRates(df, $"dom", tau = 1.0)
      .select($"mix_rate").distinct().collect().map(_.getDouble(0)).toSet
    assert(flat == Set(1.0))
    // end-to-end: sampling at the computed rates lands near the p^τ mixture
    val kept = Curate.mixtureSample(Curate.temperatureRates(df, $"dom", tau = 0.5),
      $"id", $"mix_rate")
    assert(kept.filter($"dom" === "tail").count() == 20L)
    val headKept = kept.filter($"dom" === "head").count()
    assert(headKept > 25 && headKept < 55, s"~40 of 80 head rows expected, got $headKept")
  }
}
