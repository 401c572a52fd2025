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

    // exact median/mode over ARRAY props are not single agg expressions —
    // they run as an element-explode side aggregation joined back (the
    // reference's *Array analyzers feed the flattened element multiset
    // through the same numerical path — aggregator/numerical.go)
    def isArr(prop: String): Boolean =
      c.schema.property(prop).exists(_.dataType.isInstanceOf[PropType.Arr])
    val heavy: Seq[(String, Aggregator)] =
      params.properties.toSeq.sortBy(_._1).flatMap { case (prop, aggs) =>
        if (!isArr(prop)) Nil
        else aggs.collect {
          case a @ (Aggregator.Median | Aggregator.Mode) => prop -> a
        }
      }
    val lightParams =
      if (heavy.isEmpty) params
      else params.copy(properties = params.properties.map { case (prop, aggs) =>
        prop -> (if (isArr(prop))
          aggs.filterNot(a => a == Aggregator.Median || a == Aggregator.Mode)
        else aggs)
      })
    def heavyAggsFor(df: DataFrame, groupKey: Option[String]): Seq[DataFrame] =
      heavy.groupBy(_._1).toSeq.sortBy(_._1).map { case (prop, pairs) =>
        val exploded = df.select(
          (groupKey.map(col).toSeq :+ explode(col(prop)).as("__el")): _*)
        val aggCols = pairs.map(_._2).distinct.map {
          case Aggregator.Median => median(col("__el")).as(s"${prop}_median")
          case a => deterministicMode(col("__el")).as(s"${prop}_mode")
        }
        groupKey match {
          case Some(k) => exploded.groupBy(col(k)).agg(aggCols.head, aggCols.tail: _*)
          case None => exploded.agg(aggCols.head, aggCols.tail: _*)
        }
      }

    params.groupBy match {
      case None =>
        val aggs = buildAggs(c, lightParams)
        val out = if (aggs.isEmpty) base.agg(count(lit(1)).as("meta_count"))
          else base.agg(aggs.head, aggs.tail: _*)
        // single-row frames: the joins below are driver-trivial
        heavyAggsFor(base, None).foldLeft(out)(_.crossJoin(_))
      case Some(path) =>
        val prop = path.head
        val isArray = isArr(prop)
        // arrays explode into one group per element (reference: grouped.go:21-50);
        // null values have no inverted-index entries, so they form NO group —
        // explode drops array nulls already, scalar nulls filter out here
        // (the acceptance city/cityArea matrix pins exactly 4 groups over 6
        // objects, local_aggregate_matrix_groupby_test.go:943-1070)
        val grouped = if (isArray) base.withColumn("__g", explode(col(prop)))
          else base.withColumn("__g", col(prop)).filter(col("__g").isNotNull)
        val aggs = buildAggs(c, lightParams)
        val out0 = grouped.groupBy(col("__g").as("groupedBy_value"))
          .agg(aggs.headOption.getOrElse(count(lit(1)).as("meta_count")), aggs.drop(1): _*)
        val out = heavyAggsFor(grouped.withColumnRenamed("__g", "groupedBy_value"),
            Some("groupedBy_value"))
          .foldLeft(out0)((acc, h) => acc.join(h, Seq("groupedBy_value"), "left"))
        val sorted = out.orderBy(col("meta_count").desc, col("groupedBy_value").asc)
        params.limit.map(sorted.limit).getOrElse(sorted)
    }
  }

  /** Schema-lookup aggregators `type` / `pointingTo` — answered from the
   * collection schema without scanning (reference: params.go:118,148-150;
   * the count-star-style fast path of SURVEY §4). */
  def typeInfo(c: Collection): org.apache.spark.sql.DataFrame = {
    val spark = c.df.sparkSession
    import spark.implicits._
    c.schema.properties.map { p =>
      // pointingTo is a LIST in the reference (multi-class refs) — rendered
      // comma-joined; single-class refs stay the bare name
      (p.name, p.dataType.name, p.allRefTargets.mkString(","))
    }.toDF("property", "type", "pointingTo")
  }

  /** Columns for one flat aggregation row; names are `<prop>_<agg>`. */
  private def buildAggs(c: Collection, params: AggregateParams): Seq[Column] = {
    val metaCount: Seq[Column] =
      if (params.includeMetaCount || params.groupBy.nonEmpty) Seq(count(lit(1)).as("meta_count")) else Nil
    metaCount ++ params.properties.toSeq.sortBy(_._1).flatMap { case (prop, aggs) =>
      val isArr = c.schema.property(prop).exists(_.dataType.isInstanceOf[PropType.Arr])
      aggs.map {
        // schema lookups ride the same agg row as constants — no scan work
        // (reference: params.go:118,148-150; typeInfo is the standalone form)
        case Aggregator.Type =>
          val t = c.schema.property(prop).map(_.dataType.name).getOrElse(
            throw new IllegalArgumentException(s"unknown property $prop"))
          // schema lookups answer even over an EMPTY result set (the
          // reference's matrix asserts pointingTo/type on no-result arms)
          coalesce(first(lit(t)), lit(t)).as(s"${prop}_type")
        case Aggregator.PointingTo =>
          val target = c.schema.property(prop).map(_.allRefTargets).filter(_.nonEmpty)
            .map(_.mkString(",")).getOrElse(
            throw new IllegalArgumentException(
              s"pointingTo requires a cref property, $prop is not one"))
          coalesce(first(lit(target)), lit(target)).as(s"${prop}_pointingTo")
        case a => aggColumn(col(prop), a, s"${prop}_${a.name}", isArr)
      }
    }
  }

  def aggColumn(c: Column, a: Aggregator, alias: String,
                isArray: Boolean = false): Column =
    if (isArray) aggColumnArray(c, a).as(alias) else aggColumnScalar(c, a).as(alias)

  /** Array properties aggregate ELEMENT-wise (reference: text.go / the
   * *Array analyzers feed every element through the same per-value path —
   * count counts elements, topOccurrences ranks elements, numeric aggs run
   * over the flattened element multiset). Median/mode over arrays are not
   * expressible as a single agg column — unsupported, loudly. */
  private def aggColumnArray(c: Column, a: Aggregator): Column = {
    // element count across the set; every other array aggregator is NULL
    // when no elements exist (the reference's *Array0 matrix assertions:
    // count 0, everything else nil)
    val nElems = sum(coalesce(size(c), lit(0)))
    def guarded(v: Column): Column = when(nElems > lit(0), v)
    def trues = sum(coalesce(size(filter(c, x => x.cast("boolean"))), lit(0)))
    a match {
      case Aggregator.Count => coalesce(nElems, lit(0L))
      case Aggregator.Sum   =>
        guarded(sum(aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double"))))
      case Aggregator.Mean  =>
        guarded(sum(aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double"))) / nElems)
      case Aggregator.Minimum => min(array_min(c))
      case Aggregator.Maximum => max(array_max(c))
      // boolean-array tallies: element-wise, like the scalar forms
      case Aggregator.TotalTrue  => guarded(trues)
      case Aggregator.TotalFalse => guarded(nElems - trues)
      case Aggregator.PercentageTrue  => guarded(trues.cast("double") / nElems)
      case Aggregator.PercentageFalse => guarded((nElems - trues).cast("double") / nElems)
      case Aggregator.TopOccurrences(n) => topOccurrencesAgg(c, n, flat = true)
      // Median/Mode run as the element-explode side aggregation in run()
      case other => throw new IllegalArgumentException(
        s"aggregator ${other.name} is not supported on array properties")
    }
  }

  private def aggColumnScalar(c: Column, a: Aggregator): Column = (a match {
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
    // Type/PointingTo are schema lookups, resolved in buildAggs before this
    case other => throw new IllegalArgumentException(
      s"aggregator ${other.name} needs schema context (served by buildAggs)")
  })

  /** Single-pass mode with the PINNED tie-break (highest count, then
   * smallest value): the built-in aggregate's deterministic flag returns
   * the lowest tied value, matching `modeExact`'s total order without the
   * second aggregation phase. */
  def deterministicMode(c: Column): Column = mode(c, deterministic = true)

  /** Exact deterministic mode as a two-phase plan (groupBy value → argmax). */
  def modeExact(df: DataFrame, groupCols: Seq[Column], valueCol: Column): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol.as("__v")): _*).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(groupCols: _*).orderBy(col("__cnt").desc, col("__v").asc)
    counted.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn", "__cnt").withColumnRenamed("__v", "mode")
  }

  /** topOccurrences as array<struct<value,occurs>> ordered by (occurs desc, value asc)
   * (reference: aggregator/text.go:71-152, default limit 5). */
  private def topOccurrencesAgg(c: Column, n: Int, flat: Boolean = false): Column = {
    // single-pass variant: collect per-value counts via count over a pivot is
    // not expressible as one agg column; engine API exposes the two-phase
    // `topOccurrences` below. As an agg column we approximate with
    // slice(sort by count of collected values) — implemented via
    // higher-order functions over collect_list (bounded by distinct values).
    // sort key = (-occurs, value) ascending ⇒ occurs desc, value asc on ties.
    // `flat` = array-valued property: rank the flattened ELEMENT multiset.
    def collected: Column =
      if (flat) flatten(collect_list(c)) else collect_list(c)
    val counts = transform(
      array_distinct(collected),
      v => struct((-size(filter(collected, x => x === v))).as("neg"), v.as("value")))
    transform(slice(array_sort(counts), 1, n),
      s => struct((-s.getField("neg")).as("occurs"), s.getField("value").as("value")))
  }

  /** Two-phase topOccurrences: one row per (group, value) with rank ≤ n. */
  def topOccurrences(df: DataFrame, groupCols: Seq[Column], valueCol: Column, n: Int): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol.as("value")): _*).agg(count(lit(1)).as("occurs"))
    val w = Window.partitionBy(groupCols: _*).orderBy(col("occurs").desc, col("value").asc)
    counted.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }
}
