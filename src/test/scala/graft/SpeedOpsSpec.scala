package graft

import graft.operators.SpeedOps
import org.apache.spark.sql.Row

class SpeedOpsSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, vehicle_id, lat, lon, ts_us, ts_s) position frame. */
  private def pos(rows: (Long, Long, Double, Double, Long)*) =
    rows.toDF("event_id", "vehicle_id", "lat", "lon", "ts_us")
      .withColumn("ts_s", $"ts_us" / 1e6)

  test("speeds: empty input yields empty output") {
    assert(SpeedOps.speeds(pos()).count() === 0)
  }

  test("speeds: single row per vehicle has no pair") {
    val df = pos((1L, 1L, 50.4, 30.5, 1000000L))
    assert(SpeedOps.speeds(df).count() === 0)
  }

  test("speeds: consecutive pair within gap produces one speed row") {
    val df = pos(
      (1L, 1L, 50.40, 30.50, 0L),
      (2L, 1L, 50.40, 30.51, 60_000_000L)) // 60 s apart, ~0.7 km
    val out = SpeedOps.speeds(df).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("dt_s") === 60.0)
    val v = r.getAs[Double]("speed_kmh")
    assert(v > 30 && v < 60) // ~0.71 km in 60 s ~ 42.6 km/h
  }

  test("speeds: pairs over the gap or speed cap are filtered") {
    val tooSlow = pos( // same point: speed 0 -> filtered by speed > 0
      (1L, 1L, 50.4, 30.5, 0L),
      (2L, 1L, 50.4, 30.5, 60_000_000L))
    assert(SpeedOps.speeds(tooSlow).count() === 0)
    val tooFast = pos( // ~61 km in 60 s ~ 3660 km/h
      (1L, 1L, 50.4, 30.5, 0L),
      (2L, 1L, 50.9, 30.9, 60_000_000L))
    assert(SpeedOps.speeds(tooFast).count() === 0)
    val gapTooBig = pos( // dt 400 s > default 300 s
      (1L, 1L, 50.40, 30.50, 0L),
      (2L, 1L, 50.40, 30.51, 400_000_000L))
    assert(SpeedOps.speeds(gapTooBig).count() === 0)
    assert(SpeedOps.speeds(gapTooBig, maxGapSeconds = 500.0).count() === 1)
  }

  test("speeds: duplicate timestamps order deterministically by event_id") {
    val df = pos(
      (2L, 1L, 50.41, 30.50, 0L), // same ts, higher id -> second
      (1L, 1L, 50.40, 30.50, 0L),
      (3L, 1L, 50.42, 30.50, 60_000_000L))
    val out = SpeedOps.speeds(df).collect()
    // pair (1,2) has dt 0 (filtered); pair (2,3) survives
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(3L))
    assert(out.head.getAs[Double]("prev_lat") === 50.41)
  }

  test("latestPerKey keeps exactly one row per key with id tie-break") {
    val df = pos(
      (1L, 1L, 50.1, 30.1, 100L),
      (2L, 1L, 50.2, 30.2, 100L), // tie on ts -> higher event_id wins
      (3L, 2L, 50.3, 30.3, 50L))
    val out = SpeedOps.latestPerKey(df, "vehicle_id", Seq("ts_us", "event_id"))
      .select("vehicle_id", "event_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 3L))
  }

  test("sessionize splits on gaps and numbers sessions from 1") {
    val df = pos(
      (1L, 1L, 50.0, 30.0, 0L),
      (2L, 1L, 50.0, 30.0, 10_000_000L),   // +10 s: same session
      (3L, 1L, 50.0, 30.0, 400_000_000L),  // +390 s > 300 gap: new session
      (4L, 2L, 50.0, 30.0, 0L))
    val out = SpeedOps.sessionize(df, "vehicle_id", 300.0)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("routeStats enforces the min-sample threshold") {
    val speeds = Seq(
      (1L, 10.0, 1L), (1L, 20.0, 2L), // route 1: 2 samples < 10 -> dropped
    ).toDF("route_id", "speed_kmh", "vehicle_id")
    assert(SpeedOps.routeStats(speeds).count() === 0)
  }

  test("topNGroups ranks by metric desc with tie-break asc") {
    val grouped = Seq((1L, 5L), (2L, 9L), (3L, 5L), (4L, 1L))
      .toDF("route_id", "n_samples")
    val out = SpeedOps.topNGroups(grouped, "n_samples", "route_id", 3)
      .select("route_id", "rank").as[(Long, Int)].collect().toMap
    assert(out === Map(2L -> 1, 1L -> 2, 3L -> 3))
  }

  test("taInterpolate: dense spine, filled flags, LOCF carries the last sum") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.TrafficQueries
      .taInterpolate(spark, "/root/testdata/sf0.001")
    out.cache()
    try {
      val routes = out.select("route_id").distinct().count()
      val hours = out.select("hour").distinct().count()
      assert(out.count() === routes * hours, "spine must be dense")
      // synthesized rows carry no events and (after a route's first
      // observation) the previous hour's sum
      assert(out.filter(col("filled") && col("n_events") =!= 0L).count() === 0)
      assert(out.filter(!col("filled") && col("sum_value_locf").isNull).count() === 0,
        "observed rows always have their own sum")
      // LOCF fills at least one hole somewhere (the synthetic stream is sparse)
      assert(out.filter(col("filled") && col("sum_value_locf").isNotNull).count() > 0)
    } finally out.unpersist()
  }

  test("speedsSlim: byte-identical to SpeedOps.speeds over PositionView (sf0.01)") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val cols = Seq("event_id", "vehicle_id", "route_id", "dt_s", "dist_km", "speed_kmh")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
      df.select(cols.map(col): _*).collect().toSeq
        .sortBy(r => (r.getLong(0), r.getLong(1)))
    val slim = rows(graft.queries.TrafficQueries.speedsSlim(spark, dir))
    val full = rows(SpeedOps.speeds(
      graft.sources.PositionView.fromEvents(Tables.events(spark, dir)),
      graft.queries.TrafficQueries.SynthMaxGapS, SpeedOps.MaxRealisticSpeedKmh))
    assert(slim.nonEmpty, "sf0.01 must produce speed pairs")
    // exact Double equality on every value: the slim path re-derives
    // lat/lon/ts_s with the identical arithmetic, so any ulp drift here
    // is a real divergence that would break the DuckDB hash gate
    assert(slim === full)
  }
}
