package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ann.IvfIndex

/**
 * Async vector-index maintenance — the Spark shape of the reference's
 * vector-index queue (adapters/repos/db/vector_index_queue.go: writes enqueue
 * vectors, a background worker drains the queue into the HNSW graph so ingest
 * never blocks on index insertion). Here the queue is a Structured Streaming
 * source (file drops, a Delta CDF, a Kafka topic), the worker is foreachBatch,
 * and the "graph insert" is `IvfIndex.append` — an assign-only write into the
 * centroid-partitioned layout. Checkpointing gives the same at-least-once
 * drain semantics the reference's on-disk queue does; no KMeans refit happens
 * on this path (training stays an offline batch job, exactly as the
 * reference never re-trains its quantizer on the ingest path).
 */
object IndexMaintenance {

  /**
   * Drain `newRows` (a streaming DataFrame carrying the index's id + vector
   * columns) into the persisted index layout. `Trigger.AvailableNow` makes
   * it a catch-up maintenance pass; a processing-time trigger makes it the
   * reference's continuously-running indexing worker.
   */
  def start(newRows: DataFrame, index: IvfIndex, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(index.persistPath.isDefined,
      "index maintenance appends to the persisted layout — build the IvfIndex with persistPath")
    newRows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay guard: foreachBatch is at-least-once, and append's parquet
        // write is not transactional — a redelivered batch would duplicate
        // every vector in the layout forever. A batch-id high-water mark
        // next to the layout makes replays no-ops (the residual window is a
        // crash BETWEEN the append commit and the marker write — one
        // possible duplicate append per crash, vs one per restart).
        // Batch ids are CHECKPOINT-scoped (a fresh checkpoint numbers from 0
        // again), so the marker is keyed by the stream's query id from the
        // checkpoint metadata — a later stream with a new checkpoint gets
        // its own high-water mark instead of silently dropping its first
        // batches against an older stream's.
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        val metaPath = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
        val mfs = metaPath.getFileSystem(conf)
        val queryKey = (if (mfs.exists(metaPath)) {
          val in = mfs.open(metaPath)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
        } else None).getOrElse(
          java.util.UUID.nameUUIDFromBytes(checkpoint.getBytes("UTF-8")).toString)
        val marker = new org.apache.hadoop.fs.Path(
          index.persistPath.get, s"_last_applied_batch_$queryKey")
        val fs = marker.getFileSystem(conf)
        val last =
          if (fs.exists(marker)) {
            val in = fs.open(marker)
            try scala.io.Source.fromInputStream(in).mkString.trim.toLong
            finally in.close()
          } else -1L
        if (batchId > last) {
          index.append(batch)
          val tmp = new org.apache.hadoop.fs.Path(
            index.persistPath.get, s"_last_applied_batch_$queryKey.tmp")
          val out = fs.create(tmp, true)
          try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
          fs.delete(marker, false)
          require(fs.rename(tmp, marker), s"could not commit batch marker $marker")
        }
        ()
      }
      .start()
  }

  /**
   * Keyword-index maintenance — the inverted-index arm of the same queue:
   * each batch is (1) durably upserted into the versioned store, (2) the
   * engine's collection view re-registered onto the new version, (3) folded
   * into the registered postings index via `Postings.delta` (only the batch
   * rows are tokenized; stats re-aggregate from the merged side tables).
   * Keyword queries between batches keep serving the pre-batch index;
   * after a batch they serve the delta'd one — never a full rebuild on the
   * ingest path, exactly the reference's async inverted-index flow.
   */
  def startPostings(newRows: DataFrame, store: graft.sources.CollectionStore,
                    g: graft.engine.Graft, collectionName: String,
                    checkpoint: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    newRows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // collapse duplicate ids ONCE and materialize, so the store and the
        // index fold the SAME winner (two lazy evaluations of an unordered
        // dropDuplicates could each pick a different row)
        val unique = batch.dropDuplicates(store.schema.idColumn).localCheckpoint()
        store.upsert(unique)
        g.register(store.collection)
        g.applyPostingsDelta(collectionName, unique)
        ()
      }
      .start()
}
