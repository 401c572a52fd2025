package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Collection, FilterCompiler}
import graft.model.{CollectionSchema, Where}

/**
 * Parquet-backed collection store with weaviate's CRUD semantics
 * (reference: adapters/repos/db/crud.go, batch.go, usecases/objects/):
 * put/upsert, merge (partial PATCH), batch put, batch delete by filter
 * (with dryRun), TTL expiry. The environment ships no Delta/Iceberg, so MERGE
 * is expressed as join + versioned rewrite: each mutation writes a new
 * `v<N>` directory and atomically repoints a `_latest` marker — the same
 * copy-on-write/snapshot shape Delta's MERGE produces, minus the transaction
 * log compaction.
 *
 * Scale note: the join side of every mutation is keyed on the id column, so
 * at cluster scale a mutation is one shuffle (or none, if both sides are
 * bucketed by id); TTL/batch-delete are predicate rewrites that push down to
 * the scan.
 */
final class CollectionStore(val spark: SparkSession, val root: String,
                            val schema: CollectionSchema) {

  private def latestPath = Paths.get(root, "_latest")

  def version: Int =
    if (Files.exists(latestPath)) new String(Files.readAllBytes(latestPath)).trim.toInt else -1

  def read(): DataFrame = {
    require(version >= 0, s"collection store $root is empty")
    spark.read.parquet(s"$root/v$version")
  }

  def collection: Collection = Collection(schema, read())

  /** Initialize / overwrite the whole table. */
  def init(df: DataFrame): Unit = writeVersion(df)

  /** Upsert whole objects by id (reference: crud.go:35 PutObject / batch.go:35
   * BatchPutObjects — last write wins on id collision). */
  def upsert(updates: DataFrame): Unit = {
    val id = schema.idColumn
    val current = read()
    val remaining = current.join(updates.select(col(id)), Seq(id), "left_anti")
    writeVersion(remaining.unionByName(updates, allowMissingColumns = true))
  }

  /** Partial update (PATCH) — only the columns present in `patch` (besides the
   * id) change; missing columns keep their value (reference: crud.go:292,
   * usecases/objects/merge.go). */
  def merge(patch: DataFrame): Unit = {
    val id = schema.idColumn
    val current = read()
    val patchCols = patch.columns.filterNot(_ == id)
    val renamed = patchCols.foldLeft(patch) { (d, c) => d.withColumnRenamed(c, s"__p_$c") }
    val joined = current.join(renamed, Seq(id), "left")
    val merged = patchCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(s"__p_$c"), col(c))).drop(s"__p_$c")
    }
    writeVersion(merged)
  }

  /**
   * BatchReferences: bulk edge append onto an array-valued cref property
   * (reference: adapters/repos/db/batch.go:122 — reference batches are
   * (from, refProp, to-beacon) triples). `edges` has two columns:
   * the id column and `target` (the target collection id). New targets are
   * appended set-wise (duplicates dropped); rows without new edges keep
   * their list. One aggregate + one id-keyed join — a single shuffle.
   *
   * Only multi-edge (array-column) cref props accept reference batches —
   * scalar FKs are single-valued and mutate via merge/upsert instead.
   *
   * @return (edges applied, edges dropped because their source id is absent) —
   *         the reference's batch.go reports per-object errors for unknown
   *         sources; we surface the dropped count instead of silently losing
   *         them in the join.
   */
  def addReferences(refProp: String, edges: DataFrame): (Long, Long) = {
    val id = schema.idColumn
    require(schema.property(refProp).exists(_.dataType == graft.model.PropType.Ref),
      s"$refProp is not a cref property")
    val current = read()
    require(current.schema(refProp).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
      s"$refProp is a scalar FK — BatchReferences needs a multi-edge (array) cref")
    // cache the edge batch so the counted plan IS the merged plan (a
    // non-deterministic edge source would otherwise diverge between the
    // tally jobs and the rewrite)
    val cached = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = cached.count()
      val applied = cached.join(current.select(col(id)), Seq(id), "left_semi").count()
      val grouped = cached.groupBy(col(id))
        .agg(collect_set(col("target")).as("__new_refs"))
      val merged = current.join(grouped, Seq(id), "left")
        .withColumn(refProp,
          when(col("__new_refs").isNull, col(refProp))
            .when(col(refProp).isNull, col("__new_refs"))
            .otherwise(array_distinct(concat(col(refProp), col("__new_refs")))))
        .drop("__new_refs")
      writeVersion(merged)
      (applied, total - applied)
    } finally cached.unpersist()
  }

  /** Delete by filter; dryRun returns the would-be-deleted count without
   * mutating (reference: batch.go:179, usecases/objects/batch_delete.go). */
  def deleteWhere(where: Where,
                  resolve: String => Collection =
                    n => throw new IllegalArgumentException(s"no ref target $n registered"),
                  dryRun: Boolean = false): Long = {
    val current = read()
    val compiler = new FilterCompiler(resolve)
    val matching = compiler(current, schema, where)
    val n = matching.count()
    if (!dryRun && n > 0) {
      val id = schema.idColumn
      writeVersion(current.join(matching.select(col(id)), Seq(id), "left_anti"))
    }
    n
  }

  /** TTL expiry: delete rows whose `tsColumn` is older than `ttlSeconds`
   * relative to `now` (reference: index_objects_ttl.go:63, usecases/object_ttl). */
  def expireTtl(tsColumn: String, ttlSeconds: Long, nowEpochSeconds: Long): Long = {
    val current = read()
    val cutoff = nowEpochSeconds - ttlSeconds
    val expired = current.filter(unix_timestamp(col(tsColumn)) < cutoff)
    val n = expired.count()
    if (n > 0) writeVersion(current.filter(unix_timestamp(col(tsColumn)) >= cutoff))
    n
  }

  private def writeVersion(df: DataFrame): Unit = {
    val next = version + 1
    df.write.mode("overwrite").parquet(s"$root/v$next")
    val tmp = Paths.get(root, "_latest.tmp")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, next.toString.getBytes)
    Files.move(tmp, latestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // superseded version ⇒ its cached BM25 corpus stats (persisted termDf)
    // are stale — evict them instead of leaking executor memory per mutation
    graft.operators.Bm25Search.invalidateStats(schema.name)
  }
}
