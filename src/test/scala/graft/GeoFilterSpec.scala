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

  test("edge sliver: the box scale must match haversine's sphere radius") {
    // haversine uses R=6371000 (111194.93 m/deg); a 111320 m/deg box is
    // SMALLER than the circle and drops this point: lat 1.0005 deg is
    // 111250 m away (inside r=111320) but past 111320/111320 = 1.0 deg
    val sliver = Seq((9001L, 1.0005, 0.0), (9002L, 0.0, 1.0008))
      .toDF("id", "plat", "plon")
      .select($"id", struct($"plat".as("lat"), $"plon".as("lon")).as("loc"))
    val got = compiler(sliver, schema, Where.withinGeoRange("loc", 0.0, 0.0, 111320.0))
      .select($"id").as[Long].collect().toSet
    val want = sliver.filter(VectorFunctions.haversineMeters(
        $"loc.lat".cast("double"), $"loc.lon".cast("double"), lit(0.0), lit(0.0)) <= 111320.0)
      .select($"id").as[Long].collect().toSet
    assert(want == Set(9001L, 9002L), s"bed must sit inside the circle: $want")
    assert(got == want, s"box dropped edge rows: $got vs $want")
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
