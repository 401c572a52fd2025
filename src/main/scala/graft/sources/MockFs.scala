package graft.sources

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

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
 */
final class MockFs extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")
}
