package graft.engine

import org.apache.spark.sql.DataFrame

import graft.model.CollectionSchema

/**
 * A registered collection: schema + backing DataFrame (one parquet/Delta table
 * per class — reference: the class→shards→LSM layout of adapters/repos/db
 * collapses to a partitioned columnar table; multi-tenancy's tenant-shard
 * routing (index.go:2233) becomes partition pruning on the tenant column).
 */
final case class Collection(schema: CollectionSchema, df: DataFrame) {
  def name: String = schema.name
}
