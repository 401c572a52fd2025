package graft

/** t1-style smoke: run SparkEntry.entry on sf0.001, print count + sample. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Fixtures.spark()
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows = ${rows.length}")
    rows.take(5).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry() returned no rows")
    spark.stop()
  }
}
