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
  *
  * Bounded-state semantics (the same trade the dedup gate makes): a
  * cross-batch out-of-order event merges into the user's OPEN session,
  * extending either bound; one arriving so late it precedes the open
  * session's start by more than the gap still merges here, where the batch
  * twin would reconstruct a separate earlier session — only state for the
  * one open session is held, never the session history.
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

  /** @param watermarkDelay how much event-time DISORDER the stream admits:
    *   rows older than (max event time − delay) are dropped by the stateful
    *   operator's late-row filter before they reach the session logic. The
    *   "0 seconds" default keeps the strict stream ≡ batch regime the spec
    *   pins (every admitted event is in watermark order across batches); a
    *   production ingest with out-of-order files wants a real delay, and
    *   the merge logic below handles the disorder the delay admits. */
  def sessionize(events: Dataset[Ev], gapUs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
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
            // merge: a CROSS-batch out-of-order event can precede the open
            // session's start (flatMapGroupsWithState receives late rows;
            // nothing drops them) — extend BOTH bounds or the emitted
            // session desyncs from the batch session_window twin
            Some(s.copy(startUs = math.min(s.startUs, t),
              lastUs = math.max(s.lastUs, t), n = s.n + 1))
          case Some(s) =>
            closed += ClosedSession(userId, s.startUs, s.lastUs + gapUs, s.n)
            Some(OpenSession(t, t, 1))
          case None => Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close via timeout once event time passes last + gap — CLAMPED
        // above the current watermark, DEFENSIVELY: the stateful operator
        // already drops rows older than the watermark before they reach
        // process(), so every admitted t (and hence last + gap) should sit
        // above it; but setTimeoutTimestamp THROWS — killing the whole
        // query — if any interleaving ever lets one through, and an
        // indefinitely-running sessionizer must degrade (time out next
        // batch) rather than crash on a straggler
        // CEILING ms conversion: the boundary is in µs but timeouts fire
        // on ms — flooring would let the session time out up to ~1 ms
        // BEFORE its true close boundary, so a sub-ms-late event (above
        // the watermark, inside the gap) could find its session already
        // closed and open a second one the batch twin merges
        state.setTimeoutTimestamp(
          math.max((s.lastUs + gapUs + 999L) / 1000L,
            state.getCurrentWatermarkMs() + 1L))
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process)
  }
}
