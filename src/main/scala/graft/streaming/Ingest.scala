package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming ingest — the Spark shape of weaviate's gRPC BatchStream
 * (reference: grpc/proto/v1/batch.proto:22-75): a rate-limited source
 * (`maxFilesPerTrigger` plays the role of the stream's Backoff/OutOfMemory
 * backpressure replies), per-batch validation, append sink. The async
 * vector-index queue (adapters/repos/db/vector_index_queue.go) maps to a
 * `Trigger.AvailableNow` maintenance job rebuilding index side-tables.
 */
object Ingest {

  /** File-source ingest: watch `inDir` for parquet drops, validate, append. */
  def fileIngest(spark: SparkSession, inDir: String, outDir: String,
                 schema: StructType, checkpoint: String,
                 maxFilesPerTrigger: Int = 4): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // backpressure knob
      .parquet(inDir)
      .withColumn("_ingested_at", current_timestamp())
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()

  /**
   * Streaming exact-dedup ingest: drop rows whose key (id, or a content
   * fingerprint column computed upstream) already arrived within the
   * watermark horizon — the streaming form of `Dedup.exact` for continuous
   * corpus ingestion. `dropDuplicatesWithinWatermark` keeps the dedup state
   * BOUNDED by the watermark (entries expire once the event-time horizon
   * passes), so the job runs indefinitely at ingest scale; an unbounded
   * `dropDuplicates` would accrete one state row per key forever.
   */
  def dedupIngest(spark: SparkSession, inDir: String, outDir: String,
                  schema: StructType, checkpoint: String,
                  keyCols: Seq[String], tsCol: String, watermark: String,
                  maxFilesPerTrigger: Int = 4): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()

  /**
   * Windowed streaming aggregation with watermarking (the stream-query shape
   * the reference lacks but a 100 TB pipeline needs): counts/sums per
   * (window, key) with late-data tolerance.
   */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window_ : String, watermark: String,
                     valueCol: Option[String] = Some("value")): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      valueCol.map(v => sum(col(v)).as(s"sum_$v")).toSeq
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * TTL expiry as a maintenance pass over the ingested table (reference:
   * index_objects_ttl.go:63): delete-by-age — survivors are REWRITTEN to the
   * table (staging dir + move, the CollectionStore.expireTtl shape) so the
   * expired rows actually leave storage. Returns the number deleted.
   */
  def ttlCleanup(spark: SparkSession, tableDir: String, tsCol: String,
                 ttlSeconds: Long,
                 nowEpochSeconds: Long = System.currentTimeMillis() / 1000): Long = {
    val df = spark.read.parquet(tableDir)
    // `now` pinned ONCE on the driver: current_timestamp() inside the plan
    // would be re-evaluated independently by the count job and the rewrite
    // job, so rows aging across the gap would be deleted but not counted
    val cutoff = nowEpochSeconds - ttlSeconds
    val isExpired = unix_timestamp(col(tsCol)) < cutoff
    val expired = df.filter(isExpired).count()
    if (expired > 0) {
      // null-safe survivor form: a null/unparseable ts fails both the
      // expired and the `>= cutoff` predicate — keep such rows, never
      // silently drop them uncounted (the CollectionStore.expireTtl rule)
      val survivors = df.filter(!coalesce(isExpired, lit(false)))
      val staging = tableDir.stripSuffix("/") + "__ttl_staging"
      survivors.write.mode("overwrite").parquet(staging)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
      val dst = new org.apache.hadoop.fs.Path(tableDir)
      val backup = new org.apache.hadoop.fs.Path(tableDir.stripSuffix("/") + "__ttl_old")
      // move-aside instead of delete-then-rename: rename returns FALSE (not
      // an exception) on many failures, and a crash between a delete and a
      // rename would lose the whole table. The old data survives until the
      // new table is in place.
      fs.delete(backup, true)
      require(fs.rename(dst, backup), s"ttlCleanup: could not move $dst aside")
      if (!fs.rename(new org.apache.hadoop.fs.Path(staging), dst)) {
        fs.rename(backup, dst) // roll back: put the live table back
        throw new IllegalStateException(s"ttlCleanup: could not move staging into $dst")
      }
      fs.delete(backup, true)
    }
    expired
  }
}
