package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata (the Spark mapping of weaviate's `blob` type,
 * entities/schema/data_types.go). Two tiers:
 *  - REAL pure-JVM codecs for the formats the JDK ships: `decodeImages`
 *    (PNG/JPEG/BMP/GIF via javax.imageio) and `decodeWavs` (PCM WAV via
 *    javax.sound.sampled) — mapPartitions batch decode, streaming one
 *    payload at a time (never materializes a partition), emitting typed
 *    metadata + pooled features.
 *  - STUB embedder for model-backed features (multi2vec-clip/bind need a
 *    neural net this environment doesn't have): `stubEmbedder` derives
 *    deterministic fake embeddings so the module-resolution path is testable.
 * Swap the codec body for a JNI/FFI call (video, exotic formats) without
 * touching anything downstream — schema, batching and partitioning hold.
 */
object Multimodal {

  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

  /** Output schema of `decodeImages`. */
  val ImageDecodeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_lum", DoubleType),
    StructField("grid", ArrayType(FloatType))))

  /**
   * REAL image decode via javax.imageio (pure JVM — PNG/JPEG/BMP/GIF readers
   * ship with the JDK): per row, decode the payload, emit
   * (width, height, mean luminance, grid×grid average-pooled luminance) —
   * the decode→resize→featurize front of a multimodal ingest pipeline.
   * Luminance = (r+g+b)/3 in [0,255]. Undecodable payloads yield a null
   * metadata row (never throw — one bad blob must not kill a 100 TB scan).
   * mapPartitions streams row-at-a-time: peak memory is one decoded image.
   */
  def decodeImages(df: DataFrame, idCol: Column, binCol: Column, grid: Int = 4): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val in = df.select(idCol.cast("long").as("id"), binCol.as("payload"))
    in.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val img =
          try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) Row(id, null, null, null, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val cell = Array.fill(grid * grid)(0.0)
          val cnt = Array.fill(grid * grid)(0L)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              sum += lum
              val c = math.min(grid - 1, y * grid / h) * grid + math.min(grid - 1, x * grid / w)
              cell(c) += lum; cnt(c) += 1
              x += 1
            }
            y += 1
          }
          val pooled = Array.tabulate(grid * grid)(i =>
            if (cnt(i) == 0) 0.0f else (cell(i) / cnt(i)).toFloat)
          Row(id, w, h, sum / (w.toLong * h), pooled.toSeq)
        }
      }
    }(Encoders.row(ImageDecodeSchema))
  }

  /** Output schema of `decodeWavs`. */
  val WavDecodeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", DoubleType),
    StructField("rms", DoubleType)))

  /**
   * REAL audio decode via javax.sound.sampled (pure JVM — the PCM WAV parser
   * ships with the JDK): per row, parse the payload, emit
   * (sample rate, channels, frame count, duration, RMS amplitude in [-1,1]
   * units) — the decode front of an audio quality/filter pipeline.
   * 16-bit PCM only (the JDK parser's bread and butter); undecodable
   * payloads yield a null metadata row.
   */
  def decodeWavs(df: DataFrame, idCol: Column, binCol: Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val in = df.select(idCol.cast("long").as("id"), binCol.as("payload"))
    in.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16)
          val data = ais.readAllBytes()
          val bigEndian = fmt.isBigEndian
          val n = data.length / 2
          var sumSq = 0.0
          var i = 0
          while (i < n) {
            val lo = data(2 * i); val hi = data(2 * i + 1)
            val s: Int = if (bigEndian) (lo << 8) | (hi & 0xff) else (hi << 8) | (lo & 0xff)
            val x = s / 32768.0
            sumSq += x * x
            i += 1
          }
          val frames = n.toLong / fmt.getChannels
          Row(id, fmt.getSampleRate.toInt, fmt.getChannels, frames,
            frames * 1000.0 / fmt.getSampleRate,
            math.sqrt(sumSq / math.max(1, n)))
        } catch { case _: Exception => Row(id, null, null, null, null, null) }
      }
    }(Encoders.row(WavDecodeSchema))
  }

  /** Deterministic synthetic PNG: w×h gray pixels, pixel i = (seed·31+i) mod
   * 256 (row-major) — losslessly round-trips through the real PNG codec, so
   * decoded stats are pure arithmetic in the seed (the oracle's handle). */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((seed * 31 + i) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        i += 1; x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic 16-bit mono PCM WAV: sample i =
   * ((seed·7+i) mod 201 − 100) × 327 — same arithmetic-oracle trick. */
  def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((seed * 7 + i) % 201 - 100) * 327).toInt
      data(2 * i) = s.toByte; data(2 * i + 1) = (s >> 8).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Media metadata the ingest path attaches next to every binary column. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /**
   * STUB decode: deterministic fake feature vector from the payload bytes —
   * md5 of (payload ‖ dim-index byte), first 8 hex digits scaled to [0,1).
   * Stands in for decode→resize→embed; a real implementation replaces only
   * this expression with a mapPartitions batch call into a codec. md5 (not
   * xxhash64) so ANY engine — including the DuckDB oracle — replays the
   * fake bit-exactly: `('0x'||substr(md5(payload||chr(i)),1,8))::UBIGINT`.
   */
  def stubDecodeFeatures(bin: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 127, "stubDecodeFeatures: dim must be in [1,127]")
    array((0 until dim).map { i =>
      (conv(substring(md5(concat(bin, lit(Array[Byte]((i + 1).toByte)))), 1, 8), 16, 10)
        .cast("long") % 100000L).cast("double") / 100000.0
    }: _*).cast("array<float>")
  }

  /**
   * Batch feature extraction over a binary column via mapPartitions-style
   * batching: rows flow through in partition-sized batches (the Scala
   * analogue of mapInPandas); partitions are re-sized so each batch holds
   * ~`targetBatchRows` rows — the knob that controls peak decoder memory at
   * 100 TB (payloads are large; never collect a partition into one array).
   */
  def extractFeatures(df: DataFrame, binCol: Column, dim: Int,
                      targetBatchRows: Int = 1024): DataFrame = {
    val parts = math.max(1, (df.count() / targetBatchRows.toLong).toInt)
    df.repartition(parts).withColumn("features", stubDecodeFeatures(binCol, dim))
  }

  /** Frame-sample stub: pick `n` deterministic offsets from a duration. */
  def sampleFrameOffsets(durationMs: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => (durationMs * (i * 2 + 1)) / (2 * n))

  /**
   * STUB media embedder for `Graft.withMediaEmbedder` (reference treats
   * multi2vec-bind/clip as pluggable modules): deterministic, L2-normalized
   * fake embedding from the payload bytes — per-dimension MurmurHash3 of the
   * payload with the dimension index as seed. Stands in for decode→model;
   * real deployments register an actual multimodal vectorizer instead.
   */
  def stubEmbedder(dim: Int): (graft.model.MediaKind, Array[Byte]) => Array[Float] =
    (kind, payload) => {
      // fold the modality into the hash so image/audio payloads of equal
      // bytes embed differently, like distinct model towers would
      val seed0 = scala.util.hashing.MurmurHash3.stringHash(kind.name, 42)
      val v = Array.tabulate(dim) { i =>
        val h = scala.util.hashing.MurmurHash3.bytesHash(payload, seed0 ^ i)
        ((math.floorMod(h, 2001) - 1000) / 1000.0).toFloat
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (norm > 0) v.map(_ / norm) else v
    }
}
