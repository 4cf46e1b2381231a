package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Poll event for the stateful lifecycle operator. */
case class PollEvent(event_id: Long, client_id: Long, ts_us: Long, outcome: String)

/** Per-client state: `consec` is the reset-at-threshold poll-failure
  * counter, `runPos` the position inside the current failure run
  * (resets only on success — drives the exponential backoff). */
case class PollState(consec: Int, runPos: Int)

/** Control action derived for one failed poll. */
case class PollAction(client_id: Long, event_id: Long, outcome: String,
                      consec_failures: Long, session_refresh: Boolean,
                      reconnect_delay_s: Double)

/** Poller failure-handling lifecycle as a DATA transform — the control
  * decisions of the reference's runtime loops derived from a poll
  * outcome log.
  *
  * Reference semantics (kpt/poller):
  *  - poller.py:139-187 `_poll_loop`: `consecutive_failures` increments
  *    on every failure, resets on success; a 403 (`CookiesExpiredError`,
  *    poller.py:172-177) refreshes the session immediately; at
  *    `max_consecutive_failures = 3` (config.py:105) the session is
  *    refreshed and the counter resets (poller.py:184-187).
  *  - poller.py:30-48 / websocket_client.py:333-374 reconnect backoff:
  *    delay starts at `base_delay = 5.0`, doubles per consecutive
  *    failure, capped at `max_delay = 300.0` (config.py:81-82), resets
  *    on success.
  *
  * Both counters have closed forms over the failure-run position `pos`
  * (1-based index of the failure within its maximal run of consecutive
  * failures): `consec = ((pos-1) mod 3) + 1` (the mod captures the
  * reset-at-threshold) and `delay = min(5·2^(pos-1), 300)`. That makes
  * the whole lifecycle window-expressible — one shuffle on client_id —
  * which is [[lifecycle]]; [[PollLifecycle.assign]] is the same state
  * machine as literal streaming state (flatMapGroupsWithState), the
  * form that runs against the live feed. Both are verified against the
  * same DuckDB oracle.
  */
object Poller {

  /** Deterministic poll-outcome derivation from the events table:
    * 'error' events are failed polls — a fifth of them expired-cookie
    * 403s, a fifth soft SERVER errors (the reference treats HTTP
    * 502/503/504 as a silent `return None`, session.py:60-66: the poll
    * counts as a failure but NEVER refreshes the session by itself;
    * only the consecutive-failure threshold can) — and everything else
    * is a successful poll. */
  def outcomeCol: Column =
    when(col("event_type") === "error",
      when(col("event_id") % 5 === 0, lit("http_403"))
        .when(col("event_id") % 5 === 1, lit("http_502"))
        .otherwise(lit("fail")))
      .otherwise(lit("ok"))

  /** Batch lifecycle: per failed poll, the consecutive-failure count,
    * whether the poller refreshes the session (threshold hit or 403),
    * and the reconnect backoff delay.
    *
    * Single shuffle on client_id: the failure-run position is computed
    * with two window passes over the SAME (partition, order) spec —
    * `fails_so_far` and the last success's value of it — so the second
    * pass reuses the first's exchange and sort rather than
    * re-partitioning by (client, run) as the naive two-key window
    * would. At 100 TB this is one hash exchange of (client, ts)
    * tuples; state per task is one running count.
    *
    * `events` must carry client_id (non-null), event_id, ts_us, outcome.
    *
    * Above the [[TimeBuckets]] size threshold the two prefix windows
    * partition on (client, TIME BUCKET) — the zipf(1.5) rehearsal
    * measured this lifecycle straggling 2.33x on a 39%-hot-client
    * stream, the single-sequential-task shape that cannot survive
    * 100 TB. Both running quantities decompose exactly over buckets:
    * `fails_so_far` is a prefix sum (in-bucket prefix + the summed
    * failure counts of earlier buckets), and `fails_at_ok` — the
    * running max of fails_so_far over ok rows — is the null-skipping
    * max of the earlier buckets' best (offset + in-bucket max) against
    * this bucket's own prefix, both reconstructed from a per-bucket
    * summary at |clients| x B rows aggregated off the same exchanged
    * frame the windows sort. Row-identical to the single-window form
    * (spec-asserted at B = 2..64). */
  def lifecycle(events: DataFrame, buckets: Int = 0): DataFrame = {
    val isFail = col("outcome") =!= "ok"
    val b = TimeBuckets.bucketCount(events, buckets)
    val resolved =
      if (b == 1) {
        val w = Window.partitionBy("client_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events
          .withColumn("fails_so_far",
            sum(when(isFail, 1L).otherwise(0L)).over(w))
          .withColumn("fails_at_ok", max(when(!isFail, col("fails_so_far"))).over(w))
      } else {
        val tb = TimeBuckets.withBucket(events, "ts_us", b)
        val w = Window.partitionBy(col("client_id"), col("__tb"))
          .orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val d1 = tb
          .withColumn("__f_local", sum(when(isFail, 1L).otherwise(0L)).over(w))
          .withColumn("__fa_local", max(when(!isFail, col("__f_local"))).over(w))
        // per-bucket summary: total fails; best in-bucket fails-at-ok
        // (null when the bucket has no ok rows — max skips it)
        val sm = d1.groupBy(col("client_id"), col("__tb")).agg(
          sum(when(isFail, 1L).otherwise(0L)).as("__f_b"),
          max(when(!isFail, col("__f_local"))).as("__fa_b"))
        val kw = Window.partitionBy("client_id").orderBy("__tb")
        val prev = kw.rowsBetween(Window.unboundedPreceding, -1)
        val seam = sm
          .withColumn("__off", coalesce(sum("__f_b").over(prev), lit(0L)))
          // best GLOBAL fails_at_ok over all earlier buckets: each
          // bucket's in-bucket max lifted by its own offset
          .withColumn("__fa_carry", max(col("__off") + col("__fa_b")).over(prev))
          .select(col("client_id"), col("__tb"), col("__off"), col("__fa_carry"))
        d1.join(seam, Seq("client_id", "__tb"))
          .withColumn("fails_so_far", col("__off") + col("__f_local"))
          // greatest() skips nulls (no-ok-rows-yet on either side),
          // matching the single window's null-skipping running max
          .withColumn("fails_at_ok",
            greatest(col("__fa_carry"), col("__off") + col("__fa_local")))
      }
    resolved
      .where(isFail)
      .withColumn("pos", col("fails_so_far") - coalesce(col("fails_at_ok"), lit(0L)))
      .select(col("client_id"), col("event_id"), col("outcome"),
        ((col("pos") - 1) % 3 + 1).as("consec_failures"),
        (((col("pos") - 1) % 3 + 1 === 3) || col("outcome") === "http_403")
          .as("session_refresh"),
        least(lit(5.0) * pow(lit(2.0), col("pos") - 1), lit(300.0))
          .as("reconnect_delay_s"))
  }

  /** DuckDB mirror of [[lifecycle]] + [[outcomeCol]] over the events
    * table (two-key window instead of the exchange-reusing rewrite —
    * the oracle states the semantics, the engine states the plan). */
  val lifecycleSql: String = """
    |WITH p AS (
    |  SELECT user_id AS client_id, event_id, epoch_us(ts) AS tus,
    |    CASE WHEN event_type = 'error'
    |         THEN CASE WHEN event_id % 5 = 0 THEN 'http_403'
    |                   WHEN event_id % 5 = 1 THEN 'http_502'
    |                   ELSE 'fail' END
    |         ELSE 'ok' END AS outcome
    |  FROM events),
    |r AS (
    |  SELECT *, sum(CASE WHEN outcome = 'ok' THEN 1 ELSE 0 END)
    |      OVER (PARTITION BY client_id ORDER BY tus, event_id
    |            ROWS UNBOUNDED PRECEDING) AS ok_run
    |  FROM p),
    |f AS (
    |  SELECT *, row_number()
    |      OVER (PARTITION BY client_id, ok_run ORDER BY tus, event_id) AS pos
    |  FROM r WHERE outcome <> 'ok')
    |SELECT client_id, event_id, outcome,
    |  (pos - 1) % 3 + 1 AS consec_failures,
    |  ((pos - 1) % 3 + 1 = 3) OR (outcome = 'http_403') AS session_refresh,
    |  least(5.0 * power(2, pos - 1), 300.0) AS reconnect_delay_s
    |FROM f ORDER BY client_id, event_id""".stripMargin

  /** The client's observability counters (reference
    * websocket_client.py:183-190 `stats` + PositionCache
    * `tracked_count`:124-125) as a per-client aggregate over the same
    * poll-outcome log [[lifecycle]] reads:
    *
    *  - message_count / position_count / error_count: every handled
    *    message, the subset parsed into positions (outcome ok), and the
    *    handled errors.
    *  - connection_count: the initial connect plus one reconnect per
    *    session refresh ([[lifecycle]]'s threshold-or-403 rule).
    *  - tracked_count: the dedup cache's size at end-of-log — distinct
    *    position timestamps admitted within the trailing `ttl` window
    *    (PositionCache keys on (vehicle, timestamp); a client's stream
    *    carries its own vehicle, so the key within a client is the
    *    timestamp).
    *
    * Plan shape: ONE hash exchange on client_id. The two ordered
    * windows reuse [[lifecycle]]'s (partition, order) spec, the
    * partition-only max rides the same sort (client_id prefix), and the
    * final groupBy keys on the exchange's own partitioning — at 100 TB
    * this is the lifecycle exchange plus a map-side-combined agg, no
    * second shuffle. */
  /** The reference cache's 60 s wall-clock TTL
    * (websocket_client.py:98-122), day-scaled (x1440 = 24 h) for the
    * synthetic stream whose per-client events arrive hours apart — the
    * same convention as MiscQueries.TtlDedupUs and the session-gap
    * constants. Without the scaling the trailing window holds ~0/1
    * keys per client and the counter exercises no window logic. */
  val StatsTtlUs: Long = 24L * 3600 * 1000000L

  def stats(events: DataFrame, ttlUs: Long = StatsTtlUs,
            buckets: Int = 0): DataFrame = {
    val isFail = col("outcome") =!= "ok"
    val b = TimeBuckets.bucketCount(events, buckets)
    val resolved =
      if (b == 1) {
        val wOrd = Window.partitionBy("client_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("client_id")
        events
          .withColumn("fails_so_far",
            sum(when(isFail, 1L).otherwise(0L)).over(wOrd))
          .withColumn("fails_at_ok",
            max(when(!isFail, col("fails_so_far"))).over(wOrd))
          .withColumn("max_ts_us", max(col("ts_us")).over(wAll))
      } else {
        // same (client, time-bucket) seam decomposition as [[lifecycle]]
        // — the stats windows are the identical running quantities —
        // plus the per-client max timestamp, which is a plain key max
        // on the same per-bucket summary
        val tb = TimeBuckets.withBucket(events, "ts_us", b)
        val w = Window.partitionBy(col("client_id"), col("__tb"))
          .orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val d1 = tb
          .withColumn("__f_local", sum(when(isFail, 1L).otherwise(0L)).over(w))
          .withColumn("__fa_local", max(when(!isFail, col("__f_local"))).over(w))
        val sm = d1.groupBy(col("client_id"), col("__tb")).agg(
          sum(when(isFail, 1L).otherwise(0L)).as("__f_b"),
          max(when(!isFail, col("__f_local"))).as("__fa_b"),
          max(col("ts_us")).as("__ts_b"))
        val kw = Window.partitionBy("client_id").orderBy("__tb")
        val prev = kw.rowsBetween(Window.unboundedPreceding, -1)
        val seam = sm
          .withColumn("__off", coalesce(sum("__f_b").over(prev), lit(0L)))
          .withColumn("__fa_carry", max(col("__off") + col("__fa_b")).over(prev))
          .withColumn("max_ts_us",
            max("__ts_b").over(Window.partitionBy("client_id")))
          .select(col("client_id"), col("__tb"), col("__off"),
            col("__fa_carry"), col("max_ts_us"))
        d1.join(seam, Seq("client_id", "__tb"))
          .withColumn("fails_so_far", col("__off") + col("__f_local"))
          .withColumn("fails_at_ok",
            greatest(col("__fa_carry"), col("__off") + col("__fa_local")))
      }
    resolved
      .withColumn("pos",
        when(isFail, col("fails_so_far") - coalesce(col("fails_at_ok"), lit(0L))))
      .withColumn("refresh",
        isFail && (((col("pos") - 1) % 3 + 1 === 3) || col("outcome") === "http_403"))
      .groupBy("client_id").agg(
        count(lit(1)).as("message_count"),
        count(when(!isFail, 1)).as("position_count"),
        count(when(isFail, 1)).as("error_count"),
        (count(when(col("refresh"), 1)) + 1).as("connection_count"),
        countDistinct(when(!isFail && col("ts_us") > col("max_ts_us") - ttlUs,
          col("ts_us"))).as("tracked_count"))
  }

  /** DuckDB mirror of [[stats]] + [[outcomeCol]] over the events table.
    * The literal 86400000000 is [[StatsTtlUs]] — keep in sync. */
  val statsSql: String = """
    |WITH p AS (
    |  SELECT user_id AS client_id, event_id, epoch_us(ts) AS tus,
    |    CASE WHEN event_type = 'error'
    |         THEN CASE WHEN event_id % 5 = 0 THEN 'http_403'
    |                   WHEN event_id % 5 = 1 THEN 'http_502'
    |                   ELSE 'fail' END
    |         ELSE 'ok' END AS outcome
    |  FROM events),
    |r AS (
    |  SELECT *, sum(CASE WHEN outcome = 'ok' THEN 1 ELSE 0 END)
    |      OVER (PARTITION BY client_id ORDER BY tus, event_id
    |            ROWS UNBOUNDED PRECEDING) AS ok_run,
    |    max(tus) OVER (PARTITION BY client_id) AS max_tus
    |  FROM p),
    |f AS (
    |  SELECT client_id, outcome, row_number()
    |      OVER (PARTITION BY client_id, ok_run ORDER BY tus, event_id) AS pos
    |  FROM r WHERE outcome <> 'ok'),
    |s AS (
    |  SELECT client_id,
    |    count(*) AS message_count,
    |    count(*) FILTER (WHERE outcome = 'ok') AS position_count,
    |    count(*) FILTER (WHERE outcome <> 'ok') AS error_count,
    |    count(DISTINCT CASE WHEN outcome = 'ok' AND tus > max_tus - 86400000000
    |                        THEN tus END) AS tracked_count
    |  FROM r GROUP BY client_id),
    |c AS (
    |  SELECT client_id, count(*) FILTER
    |      (WHERE ((pos - 1) % 3 + 1 = 3) OR outcome = 'http_403') AS refreshes
    |  FROM f GROUP BY client_id)
    |SELECT s.client_id, message_count, position_count, error_count,
    |  1 + coalesce(refreshes, 0) AS connection_count, tracked_count
    |FROM s LEFT JOIN c USING (client_id)
    |ORDER BY client_id""".stripMargin
}

/** The same lifecycle as LITERAL streaming state — one PollState per
  * client carried across micro-batches via flatMapGroupsWithState,
  * the sequential form of the reference's in-process counters. Within
  * a batch the group's events are sorted by (ts_us, event_id); memory
  * is bounded by events-per-client-per-batch. Cross-batch agreement
  * with the closed form requires per-client event-time-ordered arrival
  * across batches, as with [[graft.streaming.StatefulSession]]. */
object PollLifecycle {
  def assign(events: Dataset[PollEvent]): Dataset[PollAction] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.client_id)
      .flatMapGroupsWithState[PollState, PollAction](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cid: Long, it: Iterator[PollEvent], state: GroupState[PollState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(PollState(0, 0))
          val out = Seq.newBuilder[PollAction]
          sorted.foreach { e =>
            if (e.outcome == "ok") st = PollState(0, 0)
            else {
              // cap runPos: the delay saturates at 300 s from pos 7 on,
              // so the cap only guards the Int, never the value
              val pos = math.min(st.runPos + 1, 1 << 20)
              val consec = st.consec + 1
              out += PollAction(cid, e.event_id, e.outcome, consec.toLong,
                consec >= 3 || e.outcome == "http_403",
                math.min(5.0 * math.pow(2.0, pos - 1), 300.0))
              st = PollState(if (consec >= 3) 0 else consec, pos)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
