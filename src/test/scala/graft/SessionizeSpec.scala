package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{ClosedSession, Event}

/** Drives the stateful sessionizer with a real MemoryStream source. */
class SessionizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("flatMapGroupsWithState closes sessions on gap and on watermark timeout") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[Event]
    val withTime = source.toDS()
      .withColumn("ts", timestamp_millis($"ts_ms"))
      .withWatermark("ts", "0 seconds")
      .as[Event]
    val sessions = Sessionize.stateful(withTime, gapMillis = 60000) // 1-min gap
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // timestamps start above the initial watermark (0) or they drop as late
      val base = 3600000L
      // user 1: two events 10s apart (one session), then a 5-min jump (new one)
      source.addData(Event(1, 1, base), Event(1, 2, base + 10000))
      q.processAllAvailable()
      source.addData(Event(1, 3, base + 310000)) // gap 5min > 1min → closes first session
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[ClosedSession].collect()
      assert(closed.exists(s => s.user_id == 1 && s.start_ms == base &&
        s.end_ms == base + 10000 && s.n_events == 2), s"got ${closed.mkString(",")}")
      // advance watermark far → the open session (started base+310000) times out
      source.addData(Event(2, 4, base + 10000000))
      q.processAllAvailable()
      source.addData(Event(2, 5, base + 20000000))
      q.processAllAvailable()
      val after = spark.table("sessions_out").as[ClosedSession].collect()
      assert(after.exists(s => s.user_id == 1 && s.start_ms == base + 310000 && s.n_events == 1),
        s"got ${after.mkString(",")}")
    } finally q.stop()
  }

  test("a late in-gap event never moves last_ms backwards (end >= start)") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[Event]
    val withTime = source.toDS()
      .withColumn("ts", timestamp_millis($"ts_ms"))
      .withWatermark("ts", "2 hours") // slack admits late events
      .as[Event]
    val sessions = Sessionize.stateful(withTime, gapMillis = 60000)
    val name = s"sessions_late_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      val base = 7200000L
      source.addData(Event(1, 1, base), Event(1, 2, base + 50000))
      q.processAllAvailable()
      // LATE event inside the open interval: must extend the count, not
      // rewind last_ms (a rewind would close at base+30000 < last seen)
      source.addData(Event(1, 3, base + 30000))
      q.processAllAvailable()
      // forward gap break closes the session — end must be the MAX ts seen
      source.addData(Event(1, 4, base + 500000))
      q.processAllAvailable()
      val closed = spark.table(name).as[ClosedSession].collect()
      assert(closed.exists(s => s.user_id == 1 && s.start_ms == base &&
        s.end_ms == base + 50000 && s.n_events == 3), s"got ${closed.mkString(",")}")
      closed.foreach(s => assert(s.end_ms >= s.start_ms))
    } finally q.stop()
  }
}
