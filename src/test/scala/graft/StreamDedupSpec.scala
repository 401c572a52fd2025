package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.DupPair

/** Streaming MinHash-LSH dedup: horizon semantics across micro-batches,
 * parity with the batch path inside the horizon, watermark GC. */
class StreamDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val horizon = 600000L // 10 min

  private def run(batches: Seq[Seq[(Long, Long, String)]],
                  delay: String = "0 seconds"): Seq[DupPair] = {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[(Long, Long, String)]
    val docs = source.toDS().toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val banded = StreamDedup.banded(docs, "doc_id", "ts", "text",
      watermarkDelay = delay)
    val name = s"dedup_out_${System.nanoTime()}"
    val q = StreamDedup.pairs(banded, horizon, threshold = 0.7)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      spark.table(name).distinct().as[DupPair].collect().toSeq
    } finally q.stop()
  }

  test("pairs emit within the horizon, not across it; exact Jaccard attached") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content about database engines and storage"
    val base = 3600000L
    val got = run(Seq(
      Seq((1L, base, text), (2L, base + 60000, other)),
      Seq((3L, base + 120000, text)),          // dup of 1, within 10 min
      Seq((4L, base + 2000000, text))))        // dup text, but both 1 and 3 out of horizon
    assert(got.map(p => (p.id_a, p.id_b)).toSet == Set((1L, 3L)),
      s"got ${got.mkString(",")}")
    assert(got.head.jaccard == 1.0)
  }

  test("parity with the batch path when everything is inside the horizon") {
    val docs = Seq(
      (1L, "spark streams join windows batches tables queries fast"),
      (2L, "spark streams join windows batches tables queries fast"),  // dup of 1
      (3L, "spark streams join windows batches tables queries slow"),  // near-dup
      (4L, "entirely unrelated text about cooking pasta tonight"))
    val batchPairs = graft.pipeline.Dedup.minhashDuplicates(
        docs.toDF("doc_id", "text"), $"doc_id", $"text",
        shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = run(Seq(docs.zipWithIndex.map { case ((id, t), i) =>
        (id, 3600000L + i * 1000L, t) }))
      .map(p => (p.id_a, p.id_b, p.jaccard)).toSet
    assert(streamed == batchPairs, s"stream $streamed vs batch $batchPairs")
  }

  test("watermark GC: an idle bucket drops, later far-future rows still pair among themselves") {
    val text = "some repeated content that forms a stable shingle set here"
    val base = 3600000L
    val got = run(Seq(
      Seq((1L, base, text)),
      Seq((2L, base + 100000000L, text)),       // watermark jump → bucket for 1 GC'd
      Seq((3L, base + 100060000L, text))))      // pairs with 2 (in horizon), not with 1
    assert(got.map(p => (p.id_a, p.id_b)).toSet == Set((2L, 3L)),
      s"got ${got.mkString(",")}")
  }

  test("at-least-once redelivery of the same doc emits no self-pair") {
    val text = "identical content redelivered by an at least once source here"
    val base = 3600000L
    val got = run(Seq(
      Seq((1L, base, text)),
      Seq((1L, base, text)))) // exact redelivery: same id, same ts
    assert(!got.exists(p => p.id_a == p.id_b), s"got ${got.mkString(",")}")
    assert(got.isEmpty)
  }

  test("redelivered doc is stored once: a later match emits one pair, not one per copy") {
    val text = "identical content redelivered by an at least once source here"
    val base = 3600000L
    // doc 1 arrives twice (batches 1 and 2); doc 2 arrives after and matches.
    // A duplicate state entry for doc 1 would emit (1,2) twice — the memory
    // sink is read WITHOUT distinct() here to catch exactly that.
    implicit val sql = spark.sqlContext
    val source = MemoryStream[(Long, Long, String)]
    val docs = source.toDS().toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val banded = StreamDedup.banded(docs, "doc_id", "ts", "text", bands = 8)
    val name = s"dedup_redeliver_${System.nanoTime()}"
    val q = StreamDedup.pairs(banded, horizon, threshold = 0.7)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      Seq(Seq((1L, base, text)), Seq((1L, base, text)),
          Seq((2L, base + 60000L, text)))
        .foreach { b => source.addData(b: _*); q.processAllAvailable() }
      val raw = spark.table(name).as[DupPair].collect().toSeq
      // identical texts share all 8 band buckets, so the legitimate emission
      // is exactly one (1,2) row per band; a duplicate state copy of doc 1
      // would double that
      assert(raw.count(p => p.id_a == 1L && p.id_b == 2L) == 8,
        s"expected one emission per band, got: $raw")
      assert(raw.forall(p => p.id_a == 1L && p.id_b == 2L), raw.toString)
    } finally q.stop()
  }

  test("out-of-order arrival: forward horizon guard + (ts, id) pair order") {
    // horizon 10 min, watermark delay 1 h: doc 3 (ts = 2h05) arrives AFTER
    // doc 2 (ts = 3h) is already in state. It must pair with doc 1
    // (ts = 2h00, Δ 5 min, reported (1, 3) — earlier first) and must NOT
    // pair with doc 2 (55 min AHEAD of it — outside the horizon even though
    // the backward prune alone would let it through)
    val text = "identical shingle content repeated across all three documents here"
    val h2 = 7200000L
    val got = run(Seq(
      Seq((1L, h2, text), (2L, h2 + 3600000L, text)),
      Seq((3L, h2 + 300000L, text))), delay = "1 hour")
    assert(got.map(p => (p.id_a, p.id_b)).toSet == Set((1L, 3L)),
      s"got ${got.mkString(",")}")
  }
}
