package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input/output row for the TTL dedup filter. */
case class TtlEvent(event_id: Long, user_id: Long, event_type: String,
                    ts_us: Long)

/** Per-key state: event time of the live cache entry's ADMISSION. */
case class TtlState(lastAdmitUs: Long)

/** TTL-windowed duplicate suppression — the reference poller's
  * `DeduplicationFilter` (kpt/poller/websocket_client.py:98-122, used
  * at :285) as streaming state. Semantics pinned to the reference:
  *
  *  - the first arrival of a key is ADMITTED and cached;
  *  - repeats are DROPPED while the cache entry lives;
  *  - the entry expires `ttl` after the ADMITTED arrival — duplicate
  *    hits do NOT refresh it (`is_duplicate` only reads `_seen`) — so
  *    the next arrival AT or past expiry re-admits and opens a new
  *    window (expiry = admit + ttl and cleanup evicts `expiry <= now`,
  *    hence the inclusive `>=` below);
  *
  * evaluated in EVENT time where the reference uses the wall clock
  * (`time.monotonic()`): a replayed backlog must admit the same rows
  * every run, and arrival time is not replayable. Within a batch the
  * group's events are buffered and sorted by (ts_us, event_id) —
  * memory is bounded by events-per-key-per-batch — and the admission
  * chain continues across micro-batches through the one-long state.
  * This is the TTL-EXACT form of the watermark dedup in
  * [[StreamOps.streamDedup]]: that one is first-arrival-forever (state
  * = key set), this one re-admits (state = one timestamp per ACTIVE
  * key; production pairs it with a state timeout ≈ ttl so idle keys
  * evict — withheld here only because replay determinism forbids
  * processing-time timeouts).
  */
object TtlDedup {

  /** Emits exactly the admitted events, in event-time order per key. */
  def admit(events: Dataset[TtlEvent], ttlUs: Long): Dataset[TtlEvent] = {
    require(ttlUs > 0, s"ttlUs=$ttlUs must be positive")
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[TtlState, TtlEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, String), it: Iterator[TtlEvent], state: GroupState[TtlState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var last = state.getOption.map(_.lastAdmitUs).getOrElse(Long.MinValue)
          val out = sorted.flatMap { e =>
            if (last == Long.MinValue || e.ts_us - last >= ttlUs) {
              last = e.ts_us
              Some(e)
            } else None
          }
          state.update(TtlState(last))
          out.iterator
      }
  }
}
