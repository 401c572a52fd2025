package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata (the Spark mapping of weaviate's `blob` type,
 * entities/schema/data_types.go). The *pipeline* — schema, batching,
 * partition sizing, feature-column shape — is real; the codec itself is a
 * STUB (this environment has no image/audio libraries): `stubDecode`
 * derives deterministic fake features from the bytes so the plumbing is
 * testable end-to-end. Swap `decodeBatch` for a real codec (e.g. JNI/FFI
 * per-partition) without touching anything downstream.
 */
object Multimodal {

  /** Media metadata the ingest path attaches next to every binary column. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /**
   * STUB decode: deterministic fake feature vector from the payload bytes —
   * xxhash64 of (payload, dim-index) scaled to [0,1). Stands in for
   * decode→resize→embed; a real implementation replaces only this expression
   * with a mapPartitions batch call into a codec.
   */
  def stubDecodeFeatures(bin: Column, dim: Int): Column =
    array((0 until dim).map { i =>
      (abs(xxhash64(bin, lit(i))) % 100000L).cast("double") / 100000.0
    }: _*).cast("array<float>")

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
