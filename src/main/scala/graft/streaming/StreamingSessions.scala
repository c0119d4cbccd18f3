package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming sessionization — the Structured-Streaming
 * counterpart of the batch q32 sessions query (30-minute inactivity gap),
 * built on `flatMapGroupsWithState` with event-time timeout:
 *
 *  - events for one user fold into an open session held in GroupState;
 *  - a gap larger than `gapMinutes` closes the session on arrival of the
 *    next event (emitted downstream, append mode);
 *  - sessions with no further events are closed by the EventTimeTimeout
 *    once the watermark passes lastTs + gap — state is bounded by the
 *    number of concurrently-open sessions, never by history.
 *
 * At 100 TB-scale ingest this is the standard shape: state is keyed and
 * partitioned by userId (shuffle on the grouping key), each executor
 * holds only its shard of open sessions in the state store, and the
 * watermark bounds both state size and result lateness.
 */
object StreamingSessions {

  final case class Event(userId: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  final case class Session(userId: Long, sessionStart: Timestamp,
                           nEvents: Long, totalValue: Double)

  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, new Timestamp(s.start), s.n, s.sum))
      } else {
        val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
        var cur = state.getOption
        it.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs > gapMs =>
              closed += Session(userId, new Timestamp(s.start), s.n, s.sum)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(s) =>
              cur = Some(s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1,
                sum = s.sum + e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastTs + gapMs)
        }
        closed.iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
