package graft

import graft.streaming.{TtlDedup, TtlEvent}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Reference-pinned TTL dedup semantics (DeduplicationFilter,
  * kpt/poller/websocket_client.py:98-122): admit, drop while the
  * entry lives, re-admit AT/after expiry, no refresh on duplicate
  * hits — including the chain crossing a micro-batch boundary. */
class TtlDedupSpec extends SparkSpec {
  import spark.implicits._

  test("admit / drop / boundary re-admit, chain carried ACROSS micro-batches") {
    val dir = Files.createTempDirectory("graft-ttl-").toFile
    val ttl = 60_000_000L // 60 s in µs
    // batch A (one file per trigger): e1 admits at t=0; e2 (t=30s)
    // duplicate, dropped — and must NOT refresh the entry
    Seq(
      TtlEvent(1L, 1L, "a", 0L),
      TtlEvent(2L, 1L, "a", 30_000_000L))
      .toDF().coalesce(1).write.parquet(s"$dir/in/a.parquet")
    // batch B: e3 at EXACTLY t=60s re-admits (expiry = admit + ttl,
    // eviction at expiry <= now — inclusive); e4 at t=89s is inside
    // e3's window (dropped) but would have been OUTSIDE e2's t=30s
    // +ttl had the duplicate refreshed the entry... and e5 at t=121s
    // re-admits again. A second key admits independently.
    Seq(
      TtlEvent(3L, 1L, "a", 60_000_000L),
      TtlEvent(4L, 1L, "a", 89_000_000L),
      TtlEvent(5L, 1L, "a", 121_000_000L),
      TtlEvent(6L, 2L, "a", 10_000_000L))
      .toDF().coalesce(1).write.parquet(s"$dir/in/b.parquet")
    val in = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, ts_us LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/*/")
    val q = TtlDedup.admit(in.as[TtlEvent], ttl).toDF()
      .writeStream.format("memory").queryName("ttl_x_batches")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val admitted = spark.table("ttl_x_batches")
      .select("event_id").as[Long].collect().toSet
    assert(admitted === Set(1L, 3L, 5L, 6L))
  }

  test("within-batch ordering is event-time, not arrival: late row first") {
    // both events in ONE batch, listed out of ts order: the earlier one
    // must be the admission and the later one the duplicate
    val events = Seq(
      TtlEvent(2L, 7L, "x", 50_000_000L),
      TtlEvent(1L, 7L, "x", 0L)).toDS()
    val out = TtlDedup.admit(events, 60_000_000L)
      .select("event_id").as[Long].collect().toSet
    assert(out === Set(1L))
  }
}
