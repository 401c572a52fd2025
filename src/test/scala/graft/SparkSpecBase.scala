package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for the whole test run.
 * Master width: the heavy recall/parity suites are compute-bound and scale
 * near-linearly with cores (the r17 full run spent 13 of 38 wall-minutes in
 * test bodies at local[4]); 8 cores keeps the default `sbt test` inside the
 * driver's window. Shuffle partitions stay 4 — results never depend on the
 * master width, and the state-store/partition-shape tests key off
 * spark.sql.shuffle.partitions, which is unchanged. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "8")}]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
