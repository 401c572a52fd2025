package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.model._
import graft.sources.CollectionStore

/**
 * Physical layout of the versioned store: tenant directory pruning
 * (reference tenant = shard routing, adapters/repos/db/index.go:2233) and
 * id-range clustering within files (the LSM segment's sorted-by-key property,
 * adapters/repos/db/lsmkv, as parquet min/max row-group stats), plus vacuum
 * of superseded versions (the compaction-cycle cleanup analogue).
 */
class StoreLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private def tenantStore(): CollectionStore = {
    val dir = Files.createTempDirectory("graft-layout").toString
    val schema = CollectionSchema("TenantIt", "id", Seq(
      Property("name", PropType.Text, Tokenization.Field),
      Property("tenant", PropType.Text, Tokenization.Field)),
      tenantColumn = Some("tenant"))
    val st = new CollectionStore(spark, dir, schema)
    st.init(Seq(
      (1L, "a", "t0"), (2L, "b", "t1"), (3L, "c", "t1"), (4L, "d", "t2"))
      .toDF("id", "name", "tenant"))
    st
  }

  test("tenant store writes one directory per tenant and prunes on tenant filter") {
    val st = tenantStore()
    val vDir = new java.io.File(st.root, s"v${st.version}")
    val tenantDirs = vDir.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(tenantDirs.toSeq == Seq("tenant=t0", "tenant=t1", "tenant=t2"))

    val q = st.read().filter($"tenant" === "t1")
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "tenant")),
      "tenant predicate did not become a partition (directory) filter")
    q.collect()
    assert(scan.metrics("numFiles").value == 1,
      s"expected to read only tenant=t1's file, read ${scan.metrics("numFiles").value}")
    assert(q.select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("numeric-looking string tenants keep type and identity across rewrites") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val schema = CollectionSchema("TenantNum", "id", Seq(
      Property("name", PropType.Text, Tokenization.Field),
      Property("tenant", PropType.Text, Tokenization.Field)),
      tenantColumn = Some("tenant"))
    val st = new CollectionStore(spark, dir, schema)
    st.init(Seq((1L, "a", "007"), (2L, "b", "42")).toDF("id", "name", "tenant"))
    // partition type inference would read tenant back as int 7 / 42 — the
    // type must stay string and "007" must not collapse to "7" on rewrite
    assert(st.read().schema("tenant").dataType ==
      org.apache.spark.sql.types.StringType)
    st.upsert(Seq((3L, "c", "007")).toDF("id", "name", "tenant"))
    val out = st.read().filter($"tenant" === "007").select($"id")
      .as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L))
    val vDir = new java.io.File(st.root, s"v${st.version}")
    val dirs = vDir.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("tenant=007", "tenant=42"), dirs.toSeq.toString)
  }

  test("offload addresses Hive-escaped tenant directories (':' in the name)") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val off = Files.createTempDirectory("graft-layout-off").toString
    val schema = CollectionSchema("TenantEsc", "id", Seq(
      Property("name", PropType.Text, Tokenization.Field),
      Property("tenant", PropType.Text, Tokenization.Field)),
      tenantColumn = Some("tenant"))
    val st = new CollectionStore(spark, dir, schema)
    st.init(Seq((1L, "a", "acme:eu"), (2L, "b", "plain")).toDF("id", "name", "tenant"))
    st.offloadTenant("acme:eu", off)
    assert(st.read().select($"tenant").distinct().as[String].collect().toSeq == Seq("plain"))
    st.onloadTenant("acme:eu", off)
    assert(st.read().filter($"tenant" === "acme:eu").count() == 1)
  }

  test("offload on one instance invalidates a sibling instance's read memo") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val off = Files.createTempDirectory("graft-layout-off").toString
    val schema = CollectionSchema("TenantSib", "id", Seq(
      Property("name", PropType.Text, Tokenization.Field),
      Property("tenant", PropType.Text, Tokenization.Field)),
      tenantColumn = Some("tenant"))
    val a = new CollectionStore(spark, dir, schema)
    a.init(Seq((1L, "a", "t0"), (2L, "b", "t1")).toDF("id", "name", "tenant"))
    // second instance on the SAME root (the addProperty/re-open pattern the
    // root-keyed write lock exists for); prime its read memo at this version
    val b = new CollectionStore(spark, dir, schema)
    assert(b.read().count() == 2)
    // offload via instance A moves a partition dir IN PLACE (same version
    // number) — instance B must re-list, not serve its frozen file index
    // (which would throw FileNotFound or resurrect the moved tenant)
    a.offloadTenant("t1", off)
    assert(b.read().select($"tenant").distinct().as[String].collect().toSeq == Seq("t0"))
    a.onloadTenant("t1", off)
    assert(b.read().count() == 2)
  }

  test("tenant store round-trips CRUD (partition column moves last on read)") {
    val st = tenantStore()
    st.upsert(Seq((2L, "b2", "t1"), (5L, "e", "t3")).toDF("id", "name", "tenant"))
    val out = st.read().orderBy($"id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("tenant")))
    assert(out.toSeq == Seq(
      (1L, "a", "t0"), (2L, "b2", "t1"), (3L, "c", "t1"), (4L, "d", "t2"), (5L, "e", "t3")))
  }

  test("non-tenant store clusters by id: files cover disjoint sorted id ranges") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val schema = CollectionSchema("Clustered", "id", Seq(Property("v", PropType.Int)))
    val st = new CollectionStore(spark, dir, schema)
    // AQE would coalesce this toy shuffle into one ~64MB-target partition,
    // and (since r16) the adaptive write width itself collapses a KB-sized
    // frame to a single file — both desired at scale (partition count follows
    // data volume). Pin both off so the write produces several files and the
    // range disjointness is observable.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesceKey, "false")
    spark.conf.set("spark.graft.targetFileBytes", "1")
    try st.init(spark.range(1000).select($"id", ($"id" * 2).as("v")))
    finally {
      spark.conf.set(coalesceKey, "true")
      spark.conf.unset("spark.graft.targetFileBytes")
    }
    val ranges = st.read()
      .withColumn("__f", input_file_name())
      .groupBy($"__f").agg(min($"id").as("lo"), max($"id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1, "expected several files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file id ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ => ()
    }

    // the layout's payoff: an id point lookup pushes EqualTo into the scan
    // and the disjoint sorted ranges let parquet skip every other row group —
    // the scan emits only the matching group's rows, not the whole table
    val lookup = st.read().filter($"id" === 700L)
    val scan = lookup.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.metadata("PushedFilters").contains("EqualTo(id,700)"),
      s"id equality not pushed down: ${scan.metadata("PushedFilters")}")
    assert(lookup.count() == 1)
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned < 1000,
      s"row-group stats skipped nothing: scan emitted $scanned of 1000 rows")
  }

  test("write width follows data volume: small frames collapse to one file (r16)") {
    // guide §2.2/§6: a KB-sized mutation must not pay a session-width range
    // shuffle (plus its sampling pass) nor scatter 32 near-empty files
    val dir = Files.createTempDirectory("graft-layout").toString
    val schema = CollectionSchema("AdaptiveW", "id", Seq(Property("v", PropType.Int)))
    val st = new CollectionStore(spark, dir, schema)
    st.init(spark.range(200).select($"id", ($"id" * 2).as("v")))
    def files(v: Int) = new java.io.File(st.root, s"v$v").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files(0).length == 1, s"small init should write ONE file, got ${files(0).length}")
    // rows stay id-sorted inside the single file (the row-group stats payoff)
    val ids = st.read().select($"id").collect().map(_.getLong(0))
    assert(ids.toSeq == ids.sorted.toSeq, "single file must be id-sorted")
    // a tiny target spreads the SAME rows over several range-disjoint files —
    // the adaptive width is the conf-driven knob, not a local-mode constant
    // (AQE coalescing pinned off like the clustering test above, so the
    // over-threshold fallback width stays observable too)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesceKey, "false")
    spark.conf.set("spark.graft.targetFileBytes", "256")
    try st.upsert(Seq((1000L, 7L)).toDF("id", "v"))
    finally {
      spark.conf.set(coalesceKey, "true")
      spark.conf.unset("spark.graft.targetFileBytes")
    }
    assert(files(1).length > 1,
      s"256B target should spread 201 rows over several files, got ${files(1).length}")
    assert(st.read().count() == 201)
  }

  test("vacuum drops superseded versions, keeps the current") {
    val st = tenantStore()
    st.upsert(Seq((6L, "f", "t0")).toDF("id", "name", "tenant"))
    st.upsert(Seq((7L, "g", "t0")).toDF("id", "name", "tenant"))
    assert(st.version == 2)
    val removed = st.vacuum(keep = 1)
    assert(removed == 2)
    val dirs = new java.io.File(st.root).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("v2"))
    assert(st.read().count() == 6) // still readable after vacuum
    assertThrows[IllegalArgumentException](st.vacuum(keep = 0))
  }
}
