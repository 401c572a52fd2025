package graft
import org.apache.spark.scheduler._
object ProbeActions {
  def main(args: Array[String]): Unit = {
    val spark = Fixtures.spark()
    val q = args.headOption.getOrElse("q_fixture_actions_crud")
    sys.env.get("PROBE_AQE").foreach(v => spark.conf.set("spark.sql.adaptive.enabled", v))
    // PROBE_COMMIT_V2=1 restores the v1 baseline committer for A/B probing
    // (Fixtures.spark() sets v2 by default; the r16 probe ignored the value
    // and silently measured v2-vs-v2)
    sys.env.get("PROBE_COMMIT_V2").foreach(v => spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", v))
    var jobs = 0; var tasks = 0L; var taskTime = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs += 1
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks += 1; if (e.taskInfo != null) taskTime += e.taskInfo.duration
      }
    })
    // warm pass
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
    Thread.sleep(500); jobs = 0; tasks = 0; taskTime = 0
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
    val el = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"[probe] $q%s wall=$el%.2f s jobs=$jobs tasks=$tasks taskTimeSum=${taskTime/1000.0}%.1f s")
    spark.stop()
  }
}
