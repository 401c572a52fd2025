package graft.engine

import org.apache.spark.sql.DataFrame

import graft.model.CollectionSchema

/**
 * A registered collection: schema + backing DataFrame (one parquet/Delta table
 * per class — reference: the class→shards→LSM layout of adapters/repos/db
 * collapses to a partitioned columnar table; multi-tenancy's tenant-shard
 * routing (index.go:2233) becomes partition pruning on the tenant column).
 *
 * `vectorIndexes` maps named-vector name → batch-built IVF side table
 * (reference: per-shard vector index registry, shard vectorIndexes map) —
 * the planner (IvfIndex.searchOrScan) probes it for plain top-k nearVector.
 *
 * `version` is the store-version gate for result-serving side artifacts
 * (BM25 corpus stats, postings index, muvera encodings — the reference's
 * shard version / segment generation): an index built at version V serves
 * only while the collection still reports V. `CollectionStore` stamps its
 * on-disk version number salted with a per-store lineage nonce (so two
 * stores sharing a name, or a recreated root, never alias each other's
 * versions); ad-hoc constructions draw from a session-global counter in a
 * disjoint range — unlike a `System.identityHashCode` gate, versions never
 * collide after GC address reuse, and re-reading the same store version does
 * NOT spuriously invalidate (PostingsSpec "registered prebuilt index goes
 * stale with the store version" + "store re-open serves the same version").
 */
final case class Collection(
    schema: CollectionSchema,
    df: DataFrame,
    vectorIndexes: Map[String, graft.ann.IvfIndex] = Map.empty,
    version: Long = Collection.nextVersion()) {
  def name: String = schema.name

  /** Whether the named vector space is a multi-vector (ColBERT) index — its
   * physical column is array<array<float>> (reference:
   * isTargetVectorMultiVector, parse_search_request.go:1609-1630; "" resolves
   * the class's default space, an unknown name reads false). */
  def isMultiVector(target: String): Boolean = {
    val key =
      if (target.nonEmpty) Some(target)
      else schema.defaultVector.orElse(
        if (schema.vectors.size == 1) schema.vectors.keys.headOption else None)
    key.flatMap(schema.vectors.get).exists { colName =>
      df.schema.find(_.name == colName).exists(_.dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(_, _), _) => true
        case _ => false
      })
    }
  }
}

object Collection {
  // ad-hoc (non-store) collections start far above any CollectionStore disk
  // version so the two numbering spaces can't collide for one name
  private val counter = new java.util.concurrent.atomic.AtomicLong(1L << 40)
  def nextVersion(): Long = counter.incrementAndGet()
}
