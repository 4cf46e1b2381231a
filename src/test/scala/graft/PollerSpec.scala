package graft

import graft.operators.{PollAction, PollEvent, PollLifecycle, Poller}

class PollerSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  // one client, 7-failure run with a 403 at position 4, then a success,
  // then 2 more failures — exercises threshold resets, 403 refresh, and
  // the backoff doubling/reset
  private val outcomes = Seq(
    (1L, "fail"), (2L, "fail"), (3L, "fail"), (4L, "http_403"),
    (5L, "fail"), (6L, "fail"), (7L, "fail"), (8L, "ok"),
    (9L, "fail"), (10L, "fail"))

  private def eventsDf =
    outcomes.map { case (id, o) => (id, 1L, id * 1000L, o) }
      .toDF("event_id", "client_id", "ts_us", "outcome")

  private def expected = Seq(
    // (event_id, consec, refresh, delay)
    (1L, 1L, false, 5.0), (2L, 2L, false, 10.0), (3L, 3L, true, 20.0),
    (4L, 1L, true, 40.0), (5L, 2L, false, 80.0), (6L, 3L, true, 160.0),
    (7L, 1L, false, 300.0), // 5*2^6 = 320 capped at 300
    (9L, 1L, false, 5.0), (10L, 2L, false, 10.0)) // reset after the ok

  test("batch lifecycle: threshold resets, 403 refresh, capped backoff") {
    val got = Poller.lifecycle(eventsDf).orderBy("event_id")
      .select("event_id", "consec_failures", "session_refresh", "reconnect_delay_s")
      .as[(Long, Long, Boolean, Double)].collect().toSeq
    assert(got === expected)
  }

  test("streaming state machine agrees with the batch closed form") {
    val got = PollLifecycle.assign(eventsDf.as[PollEvent])
      .collect().toSeq.sortBy(_.event_id)
      .map(a => (a.event_id, a.consec_failures, a.session_refresh, a.reconnect_delay_s))
    assert(got === expected)
  }

  test("lifecycle is a single data shuffle: both window passes share one exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = Poller.lifecycle(eventsDf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) { case e: ShuffleExchangeLike => e }
    assert(shuffles.size == 1,
      s"expected ONE client_id exchange feeding both window passes:\n$plan")
  }

  test("stats: counters over the fixture log (websocket_client.py:183-190)") {
    // 10 messages; 1 ok; 9 errors; refreshes at events 3, 4 (403), 6 →
    // 1 initial connect + 3 reconnects; the single ok (ts 8000) is
    // inside the day-scaled TTL window ending at max ts 10000 → tracked 1
    val got = Poller.stats(eventsDf).as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq((1L, 10L, 1L, 9L, 4L, 1L)))
  }

  test("stats: tracked_count expires keys outside the TTL and dedups timestamps") {
    // ok at ts 1000 is older than maxTs - 60 s → evicted; the two oks
    // at ts 70e6 collapse to one tracked key (PositionCache keys on the
    // timestamp within a client); the fail contributes no key. The
    // reference's literal 60 s TTL is passed explicitly — the engine
    // DEFAULT is day-scaled (Poller.StatsTtlUs) for the synthetic
    // stream; eviction semantics are identical at any ttl.
    val df = Seq(
      (1L, 9L, 1000L, "ok"), (2L, 9L, 70000000L, "ok"),
      (3L, 9L, 70000000L, "ok"), (4L, 9L, 70000100L, "fail"))
      .toDF("event_id", "client_id", "ts_us", "outcome")
    val got = Poller.stats(df, ttlUs = 60L * 1000 * 1000)
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq((9L, 4L, 3L, 1L, 1L, 1L)))
  }

  test("stats is a single data shuffle: windows and aggs key on one exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = Poller.stats(eventsDf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) { case e: ShuffleExchangeLike => e }
    assert(shuffles.size == 1,
      s"expected ONE client_id exchange feeding windows + distinct agg:\n$plan")
  }

  test("5xx soft server errors count toward the threshold but never refresh alone") {
    // session.py:60-66: 502/503/504 → return None (a failure with NO
    // session refresh and no CookiesExpiredError); only the
    // consecutive-failure threshold — which a pure 502-run CAN cross —
    // or a 403 refreshes. Backoff keeps doubling across the
    // threshold reset (delay resets only on success).
    val df = Seq(
      (1L, 3L, 1000L, "http_502"), (2L, 3L, 2000L, "http_502"),
      (3L, 3L, 3000L, "http_502"), (4L, 3L, 4000L, "http_502"))
      .toDF("event_id", "client_id", "ts_us", "outcome")
    val want = Seq(
      (1L, 1L, false, 5.0), (2L, 2L, false, 10.0),
      (3L, 3L, true, 20.0), (4L, 1L, false, 40.0))
    val got = Poller.lifecycle(df).orderBy("event_id")
      .select("event_id", "consec_failures", "session_refresh", "reconnect_delay_s")
      .as[(Long, Long, Boolean, Double)].collect().toSeq
    assert(got === want)
    val st = PollLifecycle.assign(df.as[PollEvent]).collect().toSeq.sortBy(_.event_id)
      .map(a => (a.event_id, a.consec_failures, a.session_refresh, a.reconnect_delay_s))
    assert(st === want)
  }

  test("independent clients never share counter state") {
    val two = eventsDf.union(
      Seq((101L, 2L, 500L, "fail")).toDF("event_id", "client_id", "ts_us", "outcome"))
    val c2 = Poller.lifecycle(two).filter($"client_id" === 2L)
      .select("consec_failures", "reconnect_delay_s").as[(Long, Double)].collect()
    assert(c2.toSeq === Seq((1L, 5.0)))
  }
}

class OverpassSpec extends SparkSpec {

  private lazy val byName: Map[String, String] =
    graft.operators.Overpass.buildQueries(graft.operators.Overpass.specDf(spark))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("six query sets, each bbox-headed and footered") {
    assert(byName.keySet === Set("road_network", "road_narrowing", "elevation",
      "traffic_signals", "pedestrian", "landuse_zones"))
    byName.values.foreach { ql =>
      assert(ql.startsWith("[out:json][timeout:90][bbox:50.3,30.2,50.6,30.8];\n("))
    }
  }

  test("multi-tag filters concatenate parts in tag order") {
    assert(byName("road_narrowing").contains(
      "way[\"lanes:forward\"][\"lanes:backward\"];"))
    assert(byName("pedestrian").contains(
      "way[\"highway\"=\"footway\"][\"footway\"=\"crossing\"];"))
  }

  test("pattern filters render the anchored regex; geometry footer per set") {
    assert(byName("landuse_zones").contains(
      "relation[\"landuse\"~\"^(residential|industrial|commercial|retail)$\"];"))
    assert(byName("traffic_signals").endsWith(")\nout body;"))
    assert(byName("road_network").endsWith("out body;\n>;\nout skel qt;"))
  }
}
