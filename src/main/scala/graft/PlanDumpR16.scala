package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.sources.CollectionStore

/**
 * Round-16 plan evidence dumper (`sbt "runMain graft.PlanDumpR16 [outDir]"`).
 *
 * The r16 optimizations change the PHYSICAL WRITE plan inside
 * `CollectionStore.writeVersion` (scale-adaptive clustering width), which is
 * a side effect of the journey gates rather than the frame they return — so
 * the plan diff is captured from the store itself via the
 * `spark.graft.explainWrites` hook:
 *   - *_before.txt = `spark.graft.targetFileBytes=1`, which drives every
 *     size estimate over the adaptive threshold and reproduces the exact
 *     pre-r16 session-width plan (RangePartitioning at
 *     spark.sql.shuffle.partitions, plus the sampling pass);
 *   - *_after.txt  = the default 128 MB target (single-partition range
 *     write for small frames, no sampling job).
 *
 * Also dumps representative declared-query plans before/after-identical
 * (the optimization must not touch them): filter pushdown, vector top-k,
 * BM25, hybrid.
 */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r16")
    Files.createDirectories(Paths.get(outDir))
    val spark = Fixtures.spark()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    def dump(name: String, text: String): Unit =
      Files.write(Paths.get(outDir, s"$name.txt"), (text + "\n").getBytes("UTF-8"))

    spark.conf.set("spark.graft.explainWrites", "true")
    val schema = CollectionSchema("PlanProbe", "uuid", Seq(
      Property("name", PropType.Text),
      Property("n", PropType.Int)))
    val struct = StructType(Seq(StructField("uuid", StringType),
      StructField("name", StringType), StructField("n", LongType)))
    def world(targetBytes: Option[Long]): (String, String) = {
      targetBytes match {
        case Some(b) => spark.conf.set("spark.graft.targetFileBytes", b.toString)
        case None    => spark.conf.unset("spark.graft.targetFileBytes")
      }
      val st = new CollectionStore(spark,
        Files.createTempDirectory("graft-planprobe").toString, schema)
      st.init(spark.createDataFrame(java.util.Arrays.asList(
        (0 until 5).map(i => Row(f"0p000000-0000-4000-8000-$i%012d", s"obj-$i", i.toLong)): _*),
        struct))
      val initPlan = CollectionStore.lastWritePlan.getOrElse("<no plan captured>")
      st.upsert(spark.createDataFrame(java.util.Arrays.asList(
        Row("0p000000-0000-4000-8000-000000000099", "obj-99", 99L)), struct))
      val upsertPlan = CollectionStore.lastWritePlan.getOrElse("<no plan captured>")
      (initPlan, upsertPlan)
    }
    // before = the pre-r16 write path (estimate always over threshold →
    // session-width RangePartitioning); after = adaptive default
    val (initB, upB) = world(Some(1L))
    val (initA, upA) = world(None)
    dump("store_write_init_before", initB)
    dump("store_write_init_after", initA)
    dump("store_write_upsert_before", upB)
    dump("store_write_upsert_after", upA)
    spark.conf.unset("spark.graft.explainWrites")

    // representative declared queries — the r16 changes must leave these
    // plans untouched (PushedFilters reach the scan, TakeOrderedAndProject
    // serves vector top-k, no new Exchange)
    Seq("q_filter_and_range", "q_near_l2", "q_bm25", "q_hybrid_rrf").foreach { q =>
      dump(s"${q}_after", SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }

    // full-surface plan census (guide §1: note the plan shape for every
    // declared query): one row per query with Exchange count, join
    // strategies, scan pushdown markers. Journey gates RUN when constructed
    // (their returned steps frame is trivial — the census records that
    // honestly as a local plan); census is at sf0.01 to keep this pass short.
    if (args.length > 1 && args(1) == "census") {
      val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val line = try {
          val df = fn(spark, dir)
          // structural counts (exchanges/joins/pushdown) come from the
          // PRE-execution plan — comparable with the r16 census; codegen
          // spans come from the FINAL plan after executing THIS
          // QueryExecution, because under AQE CollapseCodegenStages runs per
          // stage at runtime and a pre-execution dump reports codegen=0 for
          // every adaptive query (the r16 census's dead column, twice over)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          try df.collect() catch { case _: Throwable => () }
          val finalPlan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          def n(pat: String) = pat.r.findAllIn(plan).size
          val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct")
            .map(j => s"$j=${n(j)}").filter(!_.endsWith("=0")).mkString(",")
          val codegenSpans = "\\[codegen id : (\\d+)\\]".r
            .findAllMatchIn(finalPlan).map(_.group(1)).toSet.size
          s"$name\texchanges=${n("Exchange")}\tcodegen=$codegenSpans\t" +
            s"pushed=${n("PushedFilters: \\[[^]]")}\tjoins=[$joins]"
        } catch { case e: Throwable => s"$name\tERROR\t${e.getClass.getSimpleName}" }
        line
      }
      Files.write(Paths.get(outDir, "plan_census.tsv"),
        (rows.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
