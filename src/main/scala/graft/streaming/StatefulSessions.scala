package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (gap-based), the
  * `flatMapGroupsWithState` realization of q_sessionize's semantics: one
  * state entry per user holds the open session; an event beyond the gap
  * closes it (emitted downstream), and an event-time timeout closes sessions
  * for users that simply stop sending. State is O(active users) and the
  * watermark bounds it — this is the indefinitely-running form of the batch
  * session_window query.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, ts: Timestamp)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Full-microsecond epoch: `Timestamp.getTime` alone is ms-truncated, and
    * the real events data carries sub-ms components — dropping them would
    * desync this stream from the batch `session_window` twin. `floorDiv`
    * (not `/`, which truncates toward zero) recovers whole seconds for
    * NEGATIVE epochs too — a pre-1970 instant with a fractional second
    * would otherwise come out a full second late; getNanos restores the
    * fraction. */
  private def us(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def sessionize(events: Dataset[Ev], gapUs: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    def process(userId: Long, batch: Iterator[Ev],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(
          ClosedSession(userId, s.startUs, s.lastUs + gapUs, s.n))
      }
      val times = batch.map(e => us(e.ts)).toArray.sorted
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      times.foreach { t =>
        open = open match {
          case Some(s) if t - s.lastUs < gapUs =>
            Some(s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1))
          case Some(s) =>
            closed += ClosedSession(userId, s.startUs, s.lastUs + gapUs, s.n)
            Some(OpenSession(t, t, 1))
          case None => Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close via timeout once event time passes last + gap
        state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process)
  }
}
