package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** Real pure-JVM codecs (javax.imageio PNG, javax.sound.sampled WAV):
 * round-trip correctness, pooled features, and bad-payload resilience. */
class MultimodalDecodeSpec extends SparkSpecBase {
  import spark.implicits._

  test("PNG round-trip: decoded dims + mean + pooled grid match the synthetic pattern") {
    // 8×8, pixel i = (5*31+i) % 256 — one grid cell per 2×2 block
    val bed = Seq((5L, Multimodal.syntheticPng(5L, 8, 8))).toDF("id", "payload")
    val row = Multimodal.decodeImages(bed, $"id", $"payload", grid = 4).head()
    assert(row.getInt(1) == 8 && row.getInt(2) == 8)
    val pix = Array.tabulate(64)(i => ((5L * 31 + i) % 256).toDouble)
    assert(math.abs(row.getDouble(3) - pix.sum / 64) < 1e-9)
    val grid = row.getSeq[Float](4)
    // cell (0,0) pools pixels (0,0),(1,0),(0,1),(1,1) = indices 0,1,8,9
    val want = (pix(0) + pix(1) + pix(8) + pix(9)) / 4
    assert(math.abs(grid.head - want) < 1e-3, s"${grid.head} vs $want")
  }

  test("WAV round-trip: rate/frames/duration/rms match the synthetic samples") {
    val bed = Seq((3L, Multimodal.syntheticWav(3L, 1000, sampleRate = 8000)))
      .toDF("id", "payload")
    val row = Multimodal.decodeWavs(bed, $"id", $"payload").head()
    assert(row.getInt(1) == 8000 && row.getInt(2) == 1 && row.getLong(3) == 1000L)
    assert(math.abs(row.getDouble(4) - 125.0) < 1e-9) // 1000 frames @ 8kHz
    val rmsWant = math.sqrt((0 until 1000).map { i =>
      val x = ((3L * 7 + i) % 201 - 100) * 327 / 32768.0; x * x
    }.sum / 1000)
    assert(math.abs(row.getDouble(5) - rmsWant) < 1e-9)
  }

  test("undecodable payloads yield null metadata rows, never throw") {
    val junk = Array[Byte](1, 2, 3, 4)
    val img = Multimodal.decodeImages(
      Seq((9L, junk)).toDF("id", "payload"), $"id", $"payload").head()
    assert(img.getLong(0) == 9L && img.isNullAt(1) && img.isNullAt(3))
    val wav = Multimodal.decodeWavs(
      Seq((9L, junk)).toDF("id", "payload"), $"id", $"payload").head()
    assert(wav.getLong(0) == 9L && wav.isNullAt(1) && wav.isNullAt(5))
  }
}
