package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Metric
import graft.operators.VectorSearch

/**
 * Dynamic vector index: starts as a *flat* (brute-force) index and upgrades
 * itself to the trained IVF index once the collection crosses a size
 * threshold (reference: adapters/repos/db/vector/dynamic/index.go — flat
 * until `threshold` objects, then an HNSW is built and the vectors copied
 * over; entities/vectorindex/dynamic/config.go:25 `DefaultThreshold =
 * 10_000`).
 *
 * The Spark mapping keeps the exact semantics but swaps the physical
 * structures for the engine's batch shapes:
 *  - *flat regime*: search is the codegen'd exact distance + TakeOrdered
 *    top-k over the stored rows — identical to the reference's flat index,
 *    which brute-forces its stored (optionally BQ-compressed) vectors.
 *  - *upgrade*: where the reference spawns a background goroutine that
 *    builds the HNSW and inserts every stored vector
 *    (index.go `doUpgrade`), the batch analogue is an IvfIndex.build over
 *    the accumulated rows — an offline job the caller triggers by crossing
 *    the threshold on `append`. Queries served during a long-running
 *    upgrade keep the flat path in the reference; callers here hold the
 *    pre-upgrade value until `append` returns the upgraded copy, which
 *    gives the same reads-stay-exact guarantee.
 *  - *upgraded regime*: search probes the IVF partitions
 *    (partition-pruned parquet when persisted); appends ride the
 *    assign-only incremental path (IvfIndex.append).
 *
 * Immutability note: like IvfIndex, every mutation returns a new value —
 * the engine registry swap is the "atomic pointer flip" of the reference's
 * dynamic.Upgrade.
 */
final case class DynamicIndex(
    threshold: Long,
    nlist: Int,
    idCol: String,
    vecCol: String,
    rows: DataFrame,
    count: Long,
    ivf: Option[IvfIndex],
    seed: Long = 42L,
    replicas: Int = 1,
    defaultNprobe: Int = 1,
    persistPath: Option[String] = None,
    appendsSinceCheckpoint: Int = 0) {

  /** Mirror of the reference's `Upgraded()` (index.go:585). */
  def upgraded: Boolean = ivf.isDefined

  /** Mirror of the reference's `ShouldUpgrade() (bool, int)` (index.go:576):
   * an un-upgraded dynamic index always reports (true, threshold). */
  def shouldUpgrade: (Boolean, Long) = (!upgraded, threshold)

  /**
   * Append rows. In the flat regime the new rows simply join the stored set;
   * crossing the threshold triggers the flat→IVF rebuild (the reference's
   * doUpgrade). In the upgraded regime the rows take the assign-only
   * incremental path — no retrain (IvfIndex.append scaladoc).
   */
  def append(newRows: DataFrame): DynamicIndex = ivf match {
    // keep `rows`/`count` current in the upgraded regime too — callers use
    // count for monitoring and rows as the rebuild/retrain input (a frozen
    // pre-upgrade snapshot would silently drop every post-upgrade batch);
    // same lineage guard as the flat regime
    case Some(ix) =>
      val merged = rows.unionByName(newRows)
      val n = count + newRows.count()
      if (appendsSinceCheckpoint >= 7)
        copy(ivf = Some(ix.append(newRows)), rows = merged.localCheckpoint(),
          count = n, appendsSinceCheckpoint = 0)
      else copy(ivf = Some(ix.append(newRows)), rows = merged, count = n,
        appendsSinceCheckpoint = appendsSinceCheckpoint + 1)
    case None =>
      val merged = rows.unionByName(newRows)
      val n = count + newRows.count()
      if (n >= threshold) upgradeNow(merged, n)
      // lineage guard, the IvfIndex.append precedent: every 8th flat-regime
      // append truncates the growing union chain so a long-lived session
      // appending small batches never builds an ever-deeper plan
      else if (appendsSinceCheckpoint >= 7)
        copy(rows = merged.localCheckpoint(), count = n, appendsSinceCheckpoint = 0)
      else copy(rows = merged, count = n,
        appendsSinceCheckpoint = appendsSinceCheckpoint + 1)
  }

  private def upgradeNow(allRows: DataFrame, n: Long): DynamicIndex =
    copy(rows = allRows, count = n,
      ivf = Some(IvfIndex.build(allRows, idCol, vecCol, nlist, seed, replicas,
        defaultNprobe, persistPath)))

  /** Top-k search: flat regime = exact scan (TakeOrderedAndProject — k rows
   * per partition cross the shuffle); upgraded = IVF probe. */
  def search(query: Array[Float], k: Int, metric: Metric,
             nprobe: Option[Int] = None): DataFrame = ivf match {
    case Some(ix) => ix.search(query, k, metric, nprobe.getOrElse(ix.defaultNprobe))
    case None =>
      VectorSearch.withDistance(rows, vecCol, query, metric)
        .orderBy(col(VectorSearch.DistanceCol).asc, col(idCol).asc)
        .limit(k)
  }
}

object DynamicIndex {

  /** Reference default (entities/vectorindex/dynamic/config.go:25). */
  val DefaultThreshold: Long = 10000L

  /** Build over the current rows: collections already at/above the threshold
   * come up upgraded immediately (the reference restores an upgraded dynamic
   * index the same way — the composer replays the "upgraded" state). */
  def build(df: DataFrame, idCol: String, vecCol: String,
            threshold: Long = DefaultThreshold,
            nlist: Int = 64, seed: Long = 42L, replicas: Int = 1,
            defaultNprobe: Int = 1,
            persistPath: Option[String] = None): DynamicIndex = {
    val n = df.count()
    val base = DynamicIndex(threshold, nlist, idCol, vecCol, df, n, None,
      seed, replicas, defaultNprobe, persistPath)
    if (n >= threshold)
      base.copy(ivf = Some(IvfIndex.build(df, idCol, vecCol, nlist, seed,
        replicas, defaultNprobe, persistPath)))
    else base
  }
}
