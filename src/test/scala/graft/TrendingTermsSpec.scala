package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.TrendingTerms

/** Streaming windowed term counts: append-mode emission on window close,
 * batch parity over closed windows, open windows held back. */
class TrendingTermsSpec extends SparkSpecBase {
  import spark.implicits._

  private val Win = 600000L // 10 min tumbling

  private def run(batches: Seq[Seq[(Long, String)]]): Seq[(Long, String, Long)] = {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val docs = source.toDS().toDF("ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val counts = TrendingTerms.termCounts(docs, "ts", "text", "10 minutes")
    val name = s"trend_out_${System.nanoTime()}"
    val q = counts.writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.ProcessingTime(0)).start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      spark.table(name)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    } finally q.stop()
  }

  test("a window emits once its end passes the watermark; open windows hold") {
    val got = run(Seq(
      Seq((0L, "alpha alpha beta"), (60000L, "alpha gamma")),
      // watermark after batch 1 = 60000 < 600000: nothing emitted yet;
      // this row pushes the watermark past the first window's end
      Seq((Win + 1000L, "delta"))))
    // first window closed: alpha 3, beta 1, gamma 1; second window open
    assert(got.toSet == Set((0L, "alpha", 3L), (0L, "beta", 1L), (0L, "gamma", 1L)))
  }

  test("batch replay parity over the closed windows + topK rank") {
    val rows = (0 until 50).map { i =>
      ((i * 61000).toLong, s"common w$i ${if (i % 3 == 0) "burst burst" else "quiet"}")
    }
    val got = run(Seq(rows.take(20), rows.slice(20, 40), rows.drop(40)))
    // batch replay: same tokenize + tumbling window, windows with
    // end <= max event time only
    val wm = rows.map(_._1).max
    val batch = rows.toDF("ts_ms", "text")
      .select(col("ts_ms"), explode(graft.text.Tokenize.word(col("text"))).as("term"))
      .withColumn("ws", (col("ts_ms") / Win).cast("long") * Win)
      .filter(col("ws") + Win <= wm)
      .groupBy(col("ws"), col("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.toSet == batch)
    // topK over the emitted counts: burst or common leads every window
    val top = TrendingTerms.topK(
        got.toDF("window_start_ms", "term", "cnt"), k = 1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    top.foreach { case (_, t) => assert(t == "burst" || t == "common") }
  }
}
