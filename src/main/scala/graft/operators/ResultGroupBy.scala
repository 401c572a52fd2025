package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Search-result grouping (reference: adapters/repos/db/shard_group_by.go:29-208):
 * walk hits in rank order, open a group per distinct property value (up to
 * `groups` groups, first-seen order), keep at most `objectsPerGroup` hits per
 * group; array-valued properties join every element's group.
 *
 * The greedy stream semantics are order-equivalent to: rank hits; rank groups
 * by their best (minimum) hit rank; keep top `groups` groups and the first
 * `objectsPerGroup` hits within each — expressible with two window functions
 * over the (bounded, top-k) search result, no driver loop.
 */
object ResultGroupBy {

  /**
   * @param ranked   search results already ordered/bounded (top-k frame)
   * @param rankCol  ascending rank column name (1 = best)
   * @param property group-by property (arrays exploded by caller)
   */
  def apply(ranked: DataFrame, rankCol: String, property: String,
            groups: Int, objectsPerGroup: Int, explodeArrays: Boolean = false): DataFrame = {
    // posexplode, not explode: when ONE hit's array seeds several groups they
    // all share that hit's rank, and ranking groups by rank alone would give
    // them the same dense_rank (the `groups` cap then overshoots and
    // group_index duplicates) — the reference walks a hit's values in ELEMENT
    // order (shard_group_by.go), so the element position is the tie-break
    // OUTER explode: a hit with an empty/null ref list joins the nil-value
    // group (the reference's "" group — the acceptance people-by-city case
    // pins the empty-livesIn person in groupedBy "")
    val base = if (explodeArrays)
                 ranked.select(col("*"), posexplode_outer(col(property)).as(Seq("__gpos", "__gval")))
               else ranked.withColumn("__gval", col(property)).withColumn("__gpos", lit(0))
    val wInGroup = Window.partitionBy(col("__gval")).orderBy(col(rankCol).asc)
    val wGroups = BoundedWindow.ordered(col("__gmin").asc) // input is a ≤pool-row rank frame
    // per-group distance metadata (reference: the grouped response's
    // `_additional { group { minDistance maxDistance } }`,
    // shard_group_by.go group struct) — over the SURVIVING hits of the
    // group, present whenever the search leg carried a distance
    val hasDist = ranked.columns.contains(VectorSearch.DistanceCol)
    val wGroupAll = Window.partitionBy(col("__gval"))
    val withMeta = base
      .withColumn("__rn_in_group", row_number().over(wInGroup))
      // group seed = its lexicographically smallest (rank, element position)
      .withColumn("__gmin", min(struct(col(rankCol), col("__gpos"))).over(wGroupAll))
      .withColumn("__gidx", dense_rank().over(wGroups))
      .filter(col("__gidx") <= groups && col("__rn_in_group") <= objectsPerGroup)
      .drop("__gpos")
    val decorated =
      if (hasDist) withMeta
        .withColumn("group_min_distance", min(col(VectorSearch.DistanceCol)).over(wGroupAll))
        .withColumn("group_max_distance", max(col(VectorSearch.DistanceCol)).over(wGroupAll))
      else withMeta
    decorated
      .withColumnRenamed("__gval", "group_value")
      .withColumnRenamed("__gidx", "group_index")
      .withColumnRenamed("__rn_in_group", "group_hit_rank")
      .drop("__gmin")
  }
}
