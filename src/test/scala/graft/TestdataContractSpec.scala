package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Testdata-contract smoke suite: the driver OWNS /root/testdata and has
 * regenerated it with different physical types between rounds (round 9:
 * events.ts flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and silently killed
 * 99/100 queries at fixture-build time). This suite pins the contract the
 * engine actually relies on, so environment drift surfaces as ONE named
 * failing test that prints the inferred schema — not as dozens of downstream
 * AnalysisExceptions with no obvious root cause.
 */
class TestdataContractSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("every driver table opens and is non-empty") {
    val bad = tables.flatMap { t =>
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        if (df.limit(1).count() == 0L) Some(s"$t: EMPTY (schema ${df.schema.simpleString})")
        else None
      } catch { case e: Throwable => Some(s"$t: UNREADABLE (${e.getMessage})") }
    }
    assert(bad.isEmpty, s"driver testdata drift:\n${bad.mkString("\n")}")
  }

  test("column contract: the names/shapes the fixture layer depends on") {
    def schema(t: String) = spark.read.parquet(s"$dir/$t.parquet").schema
    def requireCols(t: String, cols: String*): Unit = {
      val have = schema(t).fieldNames.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty,
        s"$t.parquet lost columns $missing — inferred schema: ${schema(t).simpleString}")
    }
    requireCols("lineitem", "l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    requireCols("orders", "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    requireCols("customer", "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    requireCols("documents", "doc_id", "text", "lang", "source", "n_chars")
    requireCols("embeddings", "vec_id", "embedding", "label")
    requireCols("events", "event_id", "ts", "user_id", "event_type", "value", "props")

    // embeddings.embedding must be a float array (the vector bed)
    val emb = schema("embeddings")("embedding").dataType
    assert(emb match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }, s"embeddings.embedding is ${emb.simpleString}, expected array<float>")
  }

  test("events.ts physical type is one the adaptive fixture layer handles") {
    // Fixtures.events branches on the observed dtype: nanos-as-long OR a
    // (possibly NTZ) timestamp. Anything else is NEW drift — fail loudly
    // with the schema so the fix is a one-liner, not an archaeology dig.
    val dt = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(dt match {
      case LongType | TimestampType | TimestampNTZType => true
      case _ => false
    }, s"events.ts inferred as ${dt.simpleString} — extend Fixtures.events for this type")
  }

  test("fixture registry builds against the live testdata (all collections)") {
    // the round-9 failure mode end-to-end: Fixtures.build must succeed and
    // every registered collection must be scannable
    val g = Fixtures.graft(spark, dir)
    val expect = Seq("Region", "Nation", "Customer", "Supplier", "Part", "Order",
      "Lineitem", "Document", "Embedding", "MVec", "DocVec", "EventTenant", "Event")
    val bad = expect.flatMap { n =>
      try { g.collection(n).df.limit(1).count(); None }
      catch { case e: Throwable => Some(s"$n: ${e.getMessage}") }
    }
    assert(bad.isEmpty, s"collections broken against live testdata:\n${bad.mkString("\n")}")
  }

  test("one corrupt table degrades only its own collections, not the registry") {
    // copy the testdata, corrupt events.parquet, and build: Lineitem &c must
    // still register and scan; only Event/EventTenant die (round-9 lesson —
    // a single bad driver table must never zero every query)
    val tmp = java.nio.file.Files.createTempDirectory("graft-degraded")
    tables.foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/$t.parquet"), tmp.resolve(s"$t.parquet"))
    }
    java.nio.file.Files.write(tmp.resolve("events.parquet"),
      "not a parquet file".getBytes)
    val g = Fixtures.graft(spark, tmp.toString)
    assert(g.collection("Lineitem").df.limit(1).count() == 1L)
    assert(g.collection("Document").df.limit(1).count() == 1L)
    intercept[Exception](g.collection("Event"))
  }

  test("normalized events columns: ts is TimestampType, ts_nanos is epoch nanos") {
    val ev = Fixtures.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"normalized ts is ${ev.schema("ts").dataType.simpleString}")
    assert(ev.schema("ts_nanos").dataType == LongType,
      s"normalized ts_nanos is ${ev.schema("ts_nanos").dataType.simpleString}")
    // cross-consistency: ts_nanos/1000 must equal unix_micros(ts) everywhere
    val off = ev.filter(expr("ts_nanos div 1000") =!= unix_micros(col("ts"))).count()
    assert(off == 0L, s"$off rows where ts_nanos and ts disagree")
    // sanity: timestamps land in a plausible decade, not 1970 (the round-9
    // q_stream_window symptom was every event collapsing into one 1970 window)
    val years = ev.select(year(col("ts"))).agg(min("year(ts)"), max("year(ts)")).head()
    assert(years.getInt(0) >= 2000 && years.getInt(1) <= 2100,
      s"events.ts years [${years.getInt(0)}, ${years.getInt(1)}] — epoch conversion is wrong")
  }
}
