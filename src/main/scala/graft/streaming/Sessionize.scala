package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming sessionization: one open session per user held in
 * `GroupState`, closed (emitted) when the gap to the next event exceeds
 * `gapMillis` or when event-time advances past the watermark timeout — the
 * `flatMapGroupsWithState` pattern a large-scale event pipeline needs
 * (beyond the reference's surface, which has ingest-only streaming —
 * SURVEY §2.10).
 */
object Sessionize {

  final case class Event(user_id: Long, event_id: Long, ts_ms: Long)
  final case class OpenSession(start_ms: Long, last_ms: Long, n_events: Long)
  final case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  def stateful(events: Dataset[Event], gapMillis: Long): Dataset[ClosedSession] = {
    implicit val evEnc = Encoders.product[Event]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the open session's horizon → close it
            state.getOption.foreach { s =>
              out += ClosedSession(userId, s.start_ms, s.last_ms, s.n_events)
            }
            state.remove()
          } else {
            var current = state.getOption
            batch.toSeq.sortBy(e => (e.ts_ms, e.event_id)).foreach { e =>
              current match {
                // in-gap — including a LATE event (nonzero watermark delay)
                // inside or just before the open interval: extend with
                // min/max so last_ms never moves backwards (a plain
                // last_ms = e.ts_ms would close the session early and
                // could emit end_ms < start_ms)
                case Some(s) if e.ts_ms - s.last_ms <= gapMillis &&
                    e.ts_ms >= s.start_ms - gapMillis =>
                  current = Some(OpenSession(math.min(s.start_ms, e.ts_ms),
                    math.max(s.last_ms, e.ts_ms), s.n_events + 1))
                // late event from before the open session's reach — a
                // bounded-state stand-in: close it as its own session
                // (in-order feeds never take this branch)
                case Some(s) if e.ts_ms < s.start_ms - gapMillis =>
                  out += ClosedSession(userId, e.ts_ms, e.ts_ms, 1)
                case Some(s) =>
                  out += ClosedSession(userId, s.start_ms, s.last_ms, s.n_events)
                  current = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
                case None =>
                  current = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
              }
            }
            current.foreach { s =>
              state.update(s)
              // close once the watermark passes last event + gap
              state.setTimeoutTimestamp(s.last_ms + gapMillis)
            }
          }
          out.iterator
      }
  }
}
