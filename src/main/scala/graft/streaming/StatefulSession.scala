package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for the stateful sessionizer. */
case class SessEvent(event_id: Long, user_id: Long, ts_us: Long)

/** Per-key state carried across micro-batches. */
case class SessState(lastTsUs: Long, seq: Long)

/** Session assignment emitted per event. */
case class SessAssign(event_id: Long, user_id: Long, session_seq: Long)

/** Gap-based sessionization as CUSTOM STREAMING STATE — the
  * flatMapGroupsWithState counterpart of SpeedOps.sessionize: state
  * (last timestamp + running session counter) persists per key across
  * micro-batches, so a session spanning two batches keeps its number.
  *
  * Within a batch the group's events are buffered and sorted by
  * (ts_us, event_id) — memory is bounded by events-per-key-per-batch,
  * the standard envelope for streaming sessionizers. Emits one
  * assignment per event in append mode (no watermark needed for
  * emission; pair with a timeout to evict idle keys in production).
  */
object StatefulSession {

  /** Contract: agreement with the offline sessionizer requires per-key
    * event-time-ordered ARRIVAL across batches (the natural property of
    * time-ordered replay/ingest). A cross-batch LATE event (older than
    * the stored watermark `lastTsUs`) joins the current session — no
    * online algorithm with O(1) state can renumber the past — and must
    * NOT rewind the state watermark: `max` below keeps it monotone so
    * one late straggler cannot make the next in-order event spuriously
    * open a new session. */
  def assign(events: Dataset[SessEvent], gapUs: Long): Dataset[SessAssign] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var (last, seq) = state.getOption
            .map(s => (s.lastTsUs, s.seq)).getOrElse((Long.MinValue, 0L))
          val out = sorted.map { e =>
            if (last == Long.MinValue || e.ts_us - last > gapUs) seq += 1
            last = math.max(last, e.ts_us)
            SessAssign(e.event_id, uid, seq)
          }
          state.update(SessState(last, seq))
          out.iterator
      }
  }
}
