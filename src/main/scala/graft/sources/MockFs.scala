package graft.sources

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/**
 * A local-disk Hadoop FileSystem registered under the `mockfs://` scheme —
 * the stand-in for a remote backup backend (reference: modules/backup-s3,
 * backup-gcs, backup-azure, backup-filesystem are exactly this shape: an
 * alternate FileSystem behind the same byte-stream contract; the module
 * matrix is Hadoop's FileSystem registry in this engine). Registering it as
 * `fs.mockfs.impl` lets q_backup_scheme prove Backup/ExportSnapshot are
 * scheme-agnostic end-to-end: every path flows through hadoop Path /
 * FileSystem (Spark's own parquet/json writers already do), never java.nio,
 * so a real s3a:// or gs:// destination is a config change, not a code path.
 *
 * Because mockfs:/X aliases the local /X, byte placement alone cannot
 * distinguish "flowed through this FileSystem" from "a scheme-stripping
 * java.nio write to the bare path portion" — so the backend COUNTS its
 * create/open invocations and the gate asserts the counters moved across
 * each phase. (A path-shifting backend would be stronger still, but
 * RawLocalFileSystem re-derives reported paths from the physical files, so
 * shifting breaks its own listStatus/commit protocol.)
 */
final class MockFs extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    MockFs.creates.incrementAndGet()
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    MockFs.creates.incrementAndGet()
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    MockFs.opens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object MockFs {
  /** Invocation counters (may over-count on delegating overloads — gates
   * assert strict increase, never exact values). */
  val creates = new AtomicLong(0)
  val opens = new AtomicLong(0)
}
