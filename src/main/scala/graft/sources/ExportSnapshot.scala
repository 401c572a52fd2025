package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Point-in-time parquet export of collections (reference: usecases/export —
 * ARCHITECTURE.md, scheduler.go, parallel_scan.go, parquet_writer.go;
 * status strings entities/export/status.go). The reference coordinates a
 * Prepare/Commit walk across nodes so every participant anchors its
 * snapshot in the same window, then scans shards to parquet in parallel and
 * writes an `export_metadata.json` source of truth next to the files.
 *
 * Spark mapping: Prepare pins each target store's CURRENT VERSION (the
 * versioned-parquet store makes the snapshot free — writes landing after
 * the pin go to later version directories and can never leak into the
 * anchored frame, the property the reference buys with bucket snapshots);
 * Commit scans the pinned versions — Spark's distributed parquet write IS
 * the reference's per-shard parallel scan+upload — and writes the metadata
 * blob. The scheduler's single-export slot (Prepare reserves via CAS,
 * `ErrExportAlreadyActive`) and the id registry (`ErrExportAlreadyExists` /
 * `ErrExportNotFound`, cancel-after-finish) are kept verbatim, as is the
 * EXPORT_ENABLED gate.
 *
 * Scale shape: commit is one column-complete scan of each pinned version —
 * no driver-side row data; metadata counts ride the same write via
 * DataFrame.count on the anchored (already-pruned) frame.
 */
object ExportSnapshot {
  // entities/export/status.go
  val Started = "STARTED"
  val Success = "SUCCESS"
  val Failed = "FAILED"
  val Canceled = "CANCELED"

  // scheduler.go sentinel error texts
  val ErrNotFound = "export not found"
  val ErrAlreadyExists = "export already exists"
  val ErrAlreadyActive = "export already active"
  val ErrAlreadyFinished = "export has already finished"
  val ErrNotActive = "export is not the active export"
  val ErrValidation = "export validation error"
  val ErrDisabled =
    "export API is disabled; enable it via EXPORT_ENABLED=true or the runtime config"

  final case class Anchor(className: String, store: CollectionStore, version: Int)
  final case class Prepared(id: String, anchors: Seq[Anchor])
  final case class Metadata(id: String, status: String, classes: Seq[String],
                            objectsExported: Map[String, Long], path: String)
}

/** The export scheduler: id registry + the single-export slot. */
final class ExportSnapshot(enabled: Boolean = true) {
  import ExportSnapshot._

  private val exports = scala.collection.mutable.LinkedHashMap.empty[String, Metadata]
  private var active: Option[String] = None // the CAS'd single-export slot

  /** Phase 1 — reserve the slot and pin every target's current version. */
  def prepare(id: String, targets: Seq[(String, CollectionStore)]): Prepared =
    synchronized {
      if (!enabled) throw new IllegalStateException(ErrDisabled)
      if (id.isEmpty || targets.isEmpty)
        throw new IllegalStateException(ErrValidation)
      if (exports.contains(id)) throw new IllegalStateException(ErrAlreadyExists)
      if (active.isDefined) throw new IllegalStateException(ErrAlreadyActive)
      active = Some(id)
      exports += id -> Metadata(id, Started, targets.map(_._1), Map.empty, "")
      Prepared(id, targets.map { case (cn, st) => Anchor(cn, st, st.version) })
    }

  /**
   * Phase 2 — scan the pinned versions to parquet + metadata, free the slot.
   * Only the registry's ACTIVE export may commit: a canceled/unknown handle
   * rejects (a stale Prepared must not run beside the export that now holds
   * the slot, nor flip a CANCELED id to SUCCESS). A scan/write failure marks
   * the export FAILED and frees the slot — the reference's best-effort
   * abort: partial class directories carry no metadata blob (absence of
   * `export_metadata.json` IS the partial marker) and the user re-runs
   * under a fresh id.
   */
  def commit(p: Prepared, destRoot: String): Metadata = {
    synchronized {
      val m = exports.getOrElse(p.id, throw new IllegalStateException(ErrNotFound))
      if (m.status == Canceled || !active.contains(p.id))
        throw new IllegalStateException(ErrNotActive)
      if (m.status != Started) throw new IllegalStateException(ErrAlreadyFinished)
    }
    // hadoop Path end-to-end, never java.nio: the destination may live on
    // any registered FileSystem scheme (the reference's backup-s3/gcs/azure
    // backends are exactly "a different FileSystem behind the same
    // byte-stream contract"); q_backup_scheme drives this through mockfs://
    val base = new Path(destRoot, p.id)
    // ANY failure below — scan, parquet write, or the metadata blob's own
    // create/write (real on a remote FileSystem: expired credentials,
    // transient network) — must mark FAILED and free the single-export
    // slot, or the id stays STARTED and every later prepare hits
    // ErrAlreadyActive with no way to release it
    def markFailed(): Unit = synchronized {
      exports += p.id -> Metadata(p.id, Failed, p.anchors.map(_.className),
        Map.empty, base.toString)
      active = active.filterNot(_ == p.id)
    }
    val counts =
      try p.anchors.map { a =>
        val df = a.store.readAt(a.version)
        val out = new Path(base, a.className).toString
        df.write.mode("errorifexists").parquet(out)
        // count the WRITTEN files: parquet footer metadata only — no
        // re-scan of the source version, and it proves the write landed
        a.className -> df.sparkSession.read.parquet(out).count()
      }.toMap
      catch { case e: Throwable => markFailed(); throw e }
    try synchronized {
      val meta = Metadata(p.id, Success, p.anchors.map(_.className), counts,
        base.toString)
      // class entries are RELATIVE to the metadata blob's own directory —
      // a backup moved/mounted under a different root or scheme stays
      // restorable (reference: export_metadata.json carries class names,
      // not absolute node paths)
      val json = "{\"id\":\"" + jsonEscape(p.id) + "\",\"status\":\"" + Success +
        "\",\"classes\":[" +
        p.anchors.map(a => "\"" + jsonEscape(a.className) + "\"").mkString(",") +
        "],\"objectsExported\":{" +
        p.anchors.map(a => "\"" + jsonEscape(a.className) + "\":" + counts(a.className))
          .mkString(",") + "}}"
      val fs = base.getFileSystem(
        p.anchors.head.store.spark.sparkContext.hadoopConfiguration)
      val os = fs.create(new Path(base, "export_metadata.json"), true)
      try os.write(json.getBytes("UTF-8")) finally os.close()
      exports += p.id -> meta
      active = active.filterNot(_ == p.id)
      meta
    } catch { case e: Throwable => markFailed(); throw e }
  }

  /** Cancel an export that has not finished; finished ids reject. */
  def cancel(id: String): Metadata = synchronized {
    val m = exports.getOrElse(id, throw new IllegalStateException(ErrNotFound))
    if (m.status != Started) throw new IllegalStateException(ErrAlreadyFinished)
    val canceled = m.copy(status = Canceled)
    exports += id -> canceled
    active = active.filterNot(_ == id)
    canceled
  }

  def status(id: String): Metadata =
    synchronized(exports.getOrElse(id,
      throw new IllegalStateException(ExportSnapshot.ErrNotFound)))

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }
}
