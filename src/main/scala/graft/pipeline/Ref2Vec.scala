package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ref2vec-centroid: recompute an object's vector as the centroid of its
 * referenced objects' vectors (reference: modules/ref2vec-centroid). Spark
 * shape: posexplode the vector, partial-aggregate per (group, dim) — a single
 * shuffle keyed on (group, dim) with map-side combine — then reassemble the
 * dense array ordered by dim.
 */
object Ref2Vec {

  /** Mean vector per group. Returns (group, centroid: array<double>). */
  def centroid(df: DataFrame, groupCol: Column, vecCol: Column): DataFrame =
    df.select(groupCol.as("group"), posexplode(vecCol).as(Seq("__dim", "__x")))
      .groupBy(col("group"), col("__dim"))
      .agg(avg(col("__x")).as("__mean"))
      .groupBy(col("group"))
      .agg(transform(
        array_sort(collect_list(struct(col("__dim"), col("__mean")))),
        s => s.getField("__mean")).as("centroid"))
}
