package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Graft
import graft.model._

/**
 * Drop-vector-index lifecycle unit pins (reference: adapters/repos/db/
 * drop_vector_index*.go + test/acceptance/drop_vector_index/): drop strips
 * stored vectors and removes the schema entry; a cold tenant defers the
 * finalize behind the "none" marker, whose manual removal is rejected with
 * the reference's text; reactivation reconciles and finalizes; a re-created
 * same-name space is fresh (no pre-drop value resurrection).
 */
class DropVectorIndexSpec extends SparkSpecBase {

  private def vecField(n: String) = StructField(n, ArrayType(FloatType))
  private def vec(dim: Int, seed: Float): Array[Float] =
    Array.tabulate(dim)(i => seed + i * 0.001f)

  private def mkGraft(): Graft = {
    val g = new Graft(spark)
    val struct = StructType(Seq(StructField("uuid", StringType),
      vecField("va"), vecField("vb"), StructField("tenant", StringType)))
    val rows = for { (t, ti) <- Seq("t1", "t2").zipWithIndex; i <- 0 until 5 } yield
      Row(f"00000000-0000-4000-8000-00000000$ti%02d$i%02d",
        vec(8, i.toFloat), vec(4, i.toFloat), t)
    g.register(CollectionSchema("DropMT", "uuid", Nil,
      tenantColumn = Some("tenant"),
      vectors = Map("a" -> "va", "b" -> "vb")),
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), struct))
    g.addTenants("DropMT", Seq(Tenant("t1"), Tenant("t2")))
    g
  }

  test("drop with all tenants active finalizes immediately and drops the column") {
    val g = mkGraft()
    g.dropVectorIndex("DropMT", "a")
    val c = g.collection("DropMT")
    assert(!c.schema.vectors.contains("a"))
    assert(c.schema.vectors.contains("b"))
    assert(!c.df.columns.contains("va"), "finalize drops the physical column")
    assert(c.df.filter(col("vb").isNull).count() === 0, "sibling untouched")
    assert(g.vectorDropMarker("DropMT", "a").isEmpty)
  }

  test("cold tenant defers: marker, rejection text, reconcile on activation") {
    val g = mkGraft()
    g.updateTenant("DropMT", "t2", TenantStatus.Inactive)
    g.dropVectorIndex("DropMT", "a")
    val c = g.collection("DropMT")
    assert(c.schema.vectors.contains("a"), "entry stays while a tenant is owed")
    assert(g.vectorDropMarker("DropMT", "a").contains("none"))
    // hot tenant stripped now, cold one keeps its rows
    assert(c.df.filter(col("tenant") === "t1" && col("va").isNotNull).count() === 0)
    assert(c.df.filter(col("tenant") === "t2" && col("va").isNotNull).count() === 5)
    val e = intercept[IllegalArgumentException](g.removeVectorConfig("DropMT", "a"))
    assert(e.getMessage.startsWith("""cannot remove dropped vector "a" on DropMT"""))
    assert(e.getMessage.contains("1 shards are not covered"))
    assert(g.vectorDropMarker("DropMT", "a").contains("none"),
      "marker survives the rejected update")
    g.updateTenant("DropMT", "t2", TenantStatus.Active)
    val c2 = g.collection("DropMT")
    assert(!c2.schema.vectors.contains("a"), "reactivation finalizes")
    assert(!c2.df.columns.contains("va"))
    assert(g.vectorDropMarker("DropMT", "a").isEmpty)
  }

  test("re-created same-name space starts fresh") {
    val g = mkGraft()
    g.dropVectorIndex("DropMT", "a")
    val c = g.collection("DropMT")
    // re-create "a" on a fresh column at a new dimensionality
    val withNew = c.df.withColumn("va", lit(null).cast(ArrayType(FloatType)))
    g.register(c.schema.copy(vectors = c.schema.vectors + ("a" -> "va")), withNew)
    val c2 = g.collection("DropMT")
    assert(c2.df.filter(col("va").isNotNull).count() === 0,
      "no pre-drop values resurrect through the re-created name")
  }

  test("searching a dropped space raises the engine's no-vector-named error") {
    val g = mkGraft()
    g.dropVectorIndex("DropMT", "a")
    val e = intercept[IllegalArgumentException](
      g.get(GetParams("DropMT", tenant = Some("t1"),
        nearVector = Some(NearVector(vec(8, 1f), targetVectors = Seq("a"))),
        pagination = Some(Pagination(limit = 1)))).count())
    assert(e.getMessage === "collection DropMT has no vector named a")
  }

  test("unknown vector name rejects") {
    val g = mkGraft()
    val e = intercept[IllegalArgumentException](g.dropVectorIndex("DropMT", "zz"))
    assert(e.getMessage === "collection DropMT has no vector named zz")
  }
}
