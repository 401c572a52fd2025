package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Graft
import graft.model._
import graft.sources.Backup

/** Class-level export/restore round-trip (reference: export.go SnapshotShards
 * + usecases/backup — data files + schema descriptor, restore re-creates the
 * class). */
class BackupSpec extends SparkSpecBase {
  import spark.implicits._

  test("export + restore round-trips schema, data, and query behaviour") {
    val g = new Graft(spark)
    val df = Seq(
      (1L, "spark joins data fast", "t-a", Seq(0.1f, 0.2f), "de"),
      (2L, "stream of slow data", "t-b", Seq(0.9f, 0.1f), "en"),
      (3L, "joins and windows", "t-a", Seq(0.4f, 0.4f), "en"))
      .toDF("id", "text", "tag", "vec", "tenant")
    val schema = CollectionSchema("Doc", "id", Seq(
      Property("text", PropType.Text, Tokenization.Word),
      Property("tag", PropType.Text, Tokenization.Field),
      Property("tenant", PropType.Text, Tokenization.Field)),
      vectors = Map("default" -> "vec"), defaultVector = Some("default"),
      tenantColumn = Some("tenant"))
    g.register(schema, df)

    val root = Files.createTempDirectory("graft-backup").toString
    Backup.backup(g, Seq("Doc"), root)

    val g2 = Backup.restore(new Graft(spark), root, Seq("Doc"))
    val restored = g2.collection("Doc")
    assert(restored.schema == schema)
    val before = df.orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val after = restored.df.orderBy(col("id")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("text"))).toSeq
    assert(after == before)

    // tenant layout survives: restored data is partitioned by the tenant
    // column, so tenant routing stays partition pruning
    val pruned = g2.get(GetParams("Doc", tenant = Some("en"),
      properties = Seq("id"))).collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == Seq(2L, 3L))

    // behaviour parity: tokenized filter + bm25 act identically on restored
    val q = GetParams("Doc",
      where = Some(Where.eqText("text", "data")),
      bm25 = Some(Bm25("data joins", Seq("text"))),
      pagination = Some(Pagination(limit = 5)),
      properties = Seq("id"), additional = Set("score"))
    val a = g.get(q).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = g2.get(q).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("round-trip preserves asciiFold, rangeable flags, inverted-index gates, stopwords") {
    val g = new Graft(spark)
    val schema = CollectionSchema("Cfg", "id", Seq(
      Property("txt", PropType.Text, Tokenization.Word, asciiFold = true),
      Property("n", PropType.Int, indexFilterable = false, indexRangeFilters = true)),
      stopwords = StopwordConfig("en", additions = Seq("foo"), removals = Seq("the")),
      invertedIndex = InvertedIndexConfig(indexTimestamps = true,
        indexNullState = true, indexPropertyLength = true))
    g.register(schema, Seq((1L, "café", 5L)).toDF("id", "txt", "n"))
    val root = Files.createTempDirectory("graft-backup-cfg").toString
    Backup.backup(g, Seq("Cfg"), root)
    val s2 = Backup.restoreCollection(spark, s"$root/Cfg").schema
    assert(s2.property("txt").get.asciiFold)
    assert(s2.property("n").get.indexRangeFilters && !s2.property("n").get.indexFilterable)
    assert(s2.stopwords == StopwordConfig("en", Seq("foo"), Seq("the")))
    assert(s2.invertedIndex ==
      InvertedIndexConfig(indexTimestamps = true, indexNullState = true, indexPropertyLength = true))
  }

  test("round-trip preserves vectorizeClassName=false (vectorizer corpus config)") {
    // a restore that silently reset this to true would change the stand-in
    // vectorizer's corpus and every _additional{interpretation} on the class
    val g = new Graft(spark)
    val schema = CollectionSchema("NoCls", "id", Seq(
      Property("txt", PropType.Text, Tokenization.Word)),
      vectorizeClassName = false)
    g.register(schema, Seq((1L, "hello")).toDF("id", "txt"))
    val root = Files.createTempDirectory("graft-backup-vcn").toString
    Backup.backup(g, Seq("NoCls"), root)
    val s2 = Backup.restoreCollection(spark, s"$root/NoCls").schema
    assert(!s2.vectorizeClassName)
  }

  test("export snapshot: cancel frees the slot; commit pins the prepare-time version") {
    import graft.sources.{CollectionStore, ExportSnapshot}
    val docs = (0L until 50L).map(i => (i, i * 2)).toDF("id", "v")
    val st = new CollectionStore(spark,
      Files.createTempDirectory("graft-exps").toString,
      CollectionSchema("ExpSpec", "id", Seq(Property("v", PropType.Int))))
    st.init(docs)
    val ex = new ExportSnapshot()
    val p1 = ex.prepare("a", Seq("ExpSpec" -> st))
    // cancel releases the single-export slot so a new prepare succeeds
    assert(ex.cancel("a").status == ExportSnapshot.Canceled)
    val p2 = ex.prepare("b", Seq("ExpSpec" -> st))
    // a mid-flight write bumps the store version; commit must scan the pin
    st.upsert(docs.limit(5).withColumn("id", col("id") + 1000L))
    val dest = Files.createTempDirectory("graft-expd").toString
    val m = ex.commit(p2, dest)
    assert(m.objectsExported("ExpSpec") == 50L)
    assert(spark.read.parquet(s"$dest/b/ExpSpec").count() == 50L)
    assert(st.read().count() == 55L)
    // metadata blob landed next to the files
    assert(Files.exists(java.nio.file.Paths.get(dest, "b", "export_metadata.json")))
    // a canceled id is terminal: re-preparing it is an id collision
    val err = intercept[IllegalStateException](ex.prepare("a", Seq("ExpSpec" -> st)))
    assert(err.getMessage == ExportSnapshot.ErrAlreadyExists)
    assert(p1.anchors.head.version == p2.anchors.head.version)
  }

  test("restore rejects unknown type names loudly") {
    val root = Files.createTempDirectory("graft-backup-bad").toString
    Seq("""{"name":"X","idColumn":"id","properties":[{"name":"p","dataType":"mystery","tokenization":"word","indexFilterable":true,"indexSearchable":true}],"vectors":{}}""")
      .toDF("value").coalesce(1).write.text(s"$root/schema")
    Seq((1L, "x")).toDF("id", "p").write.parquet(s"$root/data")
    val err = intercept[IllegalArgumentException] {
      Backup.restoreCollection(spark, root)
    }
    assert(err.getMessage.contains("mystery"))
  }
}
