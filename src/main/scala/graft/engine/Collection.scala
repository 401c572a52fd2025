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
 */
final case class Collection(
    schema: CollectionSchema,
    df: DataFrame,
    vectorIndexes: Map[String, graft.ann.IvfIndex] = Map.empty) {
  def name: String = schema.name
}
