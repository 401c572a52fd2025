package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorFunctions
import graft.engine.{FilterCompiler, Graft}
import graft.model._

/**
 * WithinGeoRange bounding-box pre-filter: results must stay bit-identical to
 * the pure haversine predicate (the box is a superset of the circle), and the
 * box's lat/lon range predicates must reach the parquet scan as pushed
 * filters — the scale reason the box exists.
 */
class GeoFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private lazy val points = {
    val gen = (1 to 2000).map { i =>
      (i.toLong, rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
    }
    // adversarial clusters: near the north pole, hugging the antimeridian
    val polar = (3001 to 3050).map(i => (i.toLong, 89.0 + rnd.nextDouble(), rnd.nextDouble() * 360 - 180))
    val anti = (4001 to 4050).map(i => (i.toLong, rnd.nextDouble() * 20, 179.5 + rnd.nextDouble() - (if (rnd.nextBoolean()) 360 else 0)))
    (gen ++ polar ++ anti).toDF("id", "plat", "plon")
      .select($"id", struct($"plat".as("lat"), $"plon".as("lon")).as("loc"))
  }

  private val schema = CollectionSchema("Geo", "id", Seq(Property("loc", PropType.Geo)))
  private val compiler = new FilterCompiler(n =>
    throw new IllegalArgumentException(s"no ref target $n"))

  private def survivors(df: org.apache.spark.sql.DataFrame,
                        lat: Double, lon: Double, m: Double): Set[Long] =
    compiler(df, schema, Where.withinGeoRange("loc", lat, lon, m))
      .select($"id").as[Long].collect().toSet

  private def exact(lat: Double, lon: Double, m: Double): Set[Long] =
    points.filter(VectorFunctions.haversineMeters(
        $"loc.lat".cast("double"), $"loc.lon".cast("double"), lit(lat), lit(lon)) <= m)
      .select($"id").as[Long].collect().toSet

  test("bounding box never changes the result set (incl. pole / antimeridian)") {
    val cases = Seq(
      (48.85, 2.35, 500000.0),   // mid-latitude, wide
      (48.85, 2.35, 5000.0),     // mid-latitude, tight
      (89.5, 10.0, 300000.0),    // polar cap: lon bound must drop
      (5.0, 179.9, 200000.0),    // antimeridian: lon bound must drop
      (-33.9, 18.4, 1000000.0),  // southern hemisphere
      (0.0, 0.0, 20000000.0))    // half the planet
    cases.foreach { case (la, lo, m) =>
      assert(survivors(points, la, lo, m) == exact(la, lo, m), s"mismatch at ($la,$lo,$m)")
    }
  }

  test("box range predicates push into the parquet scan") {
    val dir = Files.createTempDirectory("graft-geo").toString
    points.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val q = compiler(onDisk, schema, Where.withinGeoRange("loc", 48.85, 2.35, 5000.0))
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(loc.lat") && pushed.contains("LessThanOrEqual(loc.lat"),
      s"lat bounds not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(loc.lon"),
      s"lon bounds not pushed: $pushed")
  }
}
