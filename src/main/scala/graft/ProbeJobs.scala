package graft
import org.apache.spark.scheduler._

/** Job-attribution probe (guide §1): runs one gate twice (warm + measured)
 * and prints, for the measured pass, job count and summed job wall time
 * grouped by the job's callsite — where the per-step fixed driver cost
 * actually goes. */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val spark = Fixtures.spark()
    val q = args.headOption.getOrElse("q_fixture_actions_crud")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val bySite = scala.collection.mutable.Map.empty[String, (Int, Long)]
    val jobStart = scala.collection.mutable.Map.empty[Int, (String, Long)]
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        // result-stage name carries the action's callsite ("count at X.scala:123")
        val site = e.stageInfos.lastOption.map(_.name.takeWhile(_ != '+').trim)
          .getOrElse("?")
        jobStart.synchronized { jobStart(e.jobId) = (site, System.nanoTime()) }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.synchronized { jobStart.remove(e.jobId) }.foreach { case (site, t0) =>
          val ms = (System.nanoTime() - t0) / 1000000
          bySite.synchronized {
            val (c, t) = bySite.getOrElse(site, (0, 0L))
            bySite(site) = (c + 1, t + ms)
          }
        }
    })
    SparkEntry.queries(q)(spark, sf).count() // warm
    Thread.sleep(500)
    record = true
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, sf).count()
    val wall = (System.nanoTime() - t0) / 1e9
    record = false
    Thread.sleep(800)
    val total = bySite.values.map(_._1).sum
    val tms = bySite.values.map(_._2).sum
    println(f"[probe-jobs] $q%s wall=$wall%.2f s jobs=$total jobWallSum=${tms / 1000.0}%.1f s")
    bySite.toSeq.sortBy(-_._2._2).foreach { case (site, (c, ms)) =>
      println(f"[probe-jobs]   $c%4d jobs  ${ms / 1000.0}%7.2f s  $site%s")
    }
    spark.stop()
  }
}
