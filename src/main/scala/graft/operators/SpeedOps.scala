package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity ordered-stream operators.
  *
  * Re-expresses the reference's driver-side loops (kpt/visualize.py:61-91
  * `calculate_speeds`: sort per vehicle, consecutive-pair deltas, gap and
  * sanity filters; :178-189 latest-per-vehicle) as single-shuffle window
  * plans: one hash partition on the entity key, sort within partition,
  * lag/rank — no second wide shuffle, no collect.
  */
object SpeedOps {
  /** reference kpt/visualize.py:16-18 constants */
  val MaxGapSeconds = 300.0
  val MaxRealisticSpeedKmh = 120.0
  val MinSamplesForRouteStats = 10L

  /** Consecutive-pair speeds per vehicle. Input must carry
    * vehicle_id/lat/lon/ts_s (see PositionView; vehicle_id non-null).
    * Output one row per valid consecutive pair with dt_s, dist_km,
    * speed_kmh.
    *
    * Above the [[TimeBuckets]] size threshold the lag window partitions
    * on (vehicle, TIME BUCKET) instead of the bare key — a hot vehicle's
    * history is otherwise one sequential sorted task (39% of the stream
    * on one key in the zipf(1.5) rehearsal; 22-39 TB at the 100 TB
    * target). The seam is exact: the only pair a bucket cannot form is
    * (last row of the previous bucket, first row of this one), and that
    * predecessor is recovered from a map-side-combined per-bucket
    * aggregate (|keys| x B rows) carrying the previous bucket's last
    * (lat, lon, ts_s) — lagged per column in-bucket and coalesced with
    * the carry, which cannot tear because in-bucket lag nulls appear
    * only on the bucket's first row and the carry travels as one
    * struct. Row-identical to the single-window form (spec-asserted at
    * B = 2..64). */
  def speeds(pos: DataFrame,
             maxGapSeconds: Double = MaxGapSeconds,
             maxSpeedKmh: Double = MaxRealisticSpeedKmh,
             buckets: Int = 0): DataFrame = {
    // event_id tie-break: duplicate timestamps per vehicle would make
    // lag() nondeterministic across runs (and vs the oracle) otherwise.
    val paired = TimeBuckets.lag1(pos, "vehicle_id", "ts_us", "event_id",
      Seq("lat", "lon", "ts_s"), buckets)
    paired
      .filter(col("prev_ts_s").isNotNull)
      .withColumn("dt_s", col("ts_s") - col("prev_ts_s"))
      .filter(col("dt_s") > 0 && col("dt_s") <= maxGapSeconds)
      .withColumn("dist_km",
        GeoFunctions.haversineKm(col("prev_lat"), col("prev_lon"), col("lat"), col("lon")))
      .withColumn("speed_kmh", col("dist_km") / col("dt_s") * 3600)
      .filter(col("speed_kmh") > 0 && col("speed_kmh") < maxSpeedKmh)
  }

  /** Per-route stats over the speed stream (visualize.py:117-170):
    * avg speed, distinct vehicles, sample count; min-sample threshold. */
  def routeStats(speedDf: DataFrame): DataFrame =
    speedDf.groupBy("route_id").agg(
      round(avg("speed_kmh"), 4).as("avg_speed_kmh"),
      countDistinct("vehicle_id").as("n_vehicles"),
      count(lit(1)).as("n_samples"))
      .filter(col("n_samples") >= MinSamplesForRouteStats)

  /** Latest row per key via max_by-style window (visualize.py:178-189).
    * Tie-break on a unique id so results are deterministic. */
  def latestPerKey(df: DataFrame, key: String, order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order.map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Top-N groups by a metric with deterministic tie-break.
    *
    * POST-AGGREGATION ONLY: the unpartitioned window is a single-task
    * sort, acceptable strictly because the input is an already-reduced
    * per-group frame (|groups| rows, e.g. 25 routes — never the raw
    * stream). For row-level global ranking use RankOps.withGlobalRank. */
  def topNGroups(grouped: DataFrame, metric: String, tieBreak: String,
                 n: Int, asc: Boolean = false): DataFrame = {
    val ord = if (asc) col(metric).asc else col(metric).desc
    val w = Window.orderBy(ord, col(tieBreak).asc)
    grouped.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** Gap-based sessionization: new session when the gap to the previous
    * row (per key) exceeds gapSeconds; session id = running count of
    * session starts. Single shuffle on the key (`key` must be
    * non-null — PositionView guarantees it).
    *
    * Above the [[TimeBuckets]] size threshold the running count
    * partitions on (key, TIME BUCKET): in-bucket windows compute the
    * locally-decidable part (every gap whose predecessor is in the same
    * bucket), and the cross-bucket remainder — whether each bucket's
    * FIRST row starts a session, plus the count of starts in all
    * earlier buckets — is reconstructed exactly from a per-bucket
    * summary (first/last ts, local start count) at |keys| x B rows:
    * the bucket-seam gap compares this bucket's first ts against the
    * previous nonempty bucket's last ts, and the prefix offset is a
    * running sum over the summary. session_seq = offset + seam-start +
    * local running count, row-identical to the single-window form
    * (spec-asserted at B = 2..64). The per-bucket summary aggregates
    * the SAME (key, bucket)-exchanged frame the window sorts, so the
    * big side shuffles once (exchange reuse). */
  def sessionize(pos: DataFrame, key: String, gapSeconds: Double,
                 buckets: Int = 0): DataFrame = {
    val b = TimeBuckets.bucketCount(pos, buckets)
    val outCols = pos.columns.map(col) :+ col("session_seq")
    if (b == 1) {
      val w = Window.partitionBy(key).orderBy("ts_us", "event_id")
      pos
        .withColumn("__prev_ts_s", lag("ts_s", 1).over(w))
        .withColumn("__new_session",
          when(col("__prev_ts_s").isNull ||
            (col("ts_s") - col("__prev_ts_s")) > gapSeconds, 1L).otherwise(0L))
        .withColumn("session_seq",
          sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(outCols: _*)
    } else {
      val tb = TimeBuckets.withBucket(pos, "ts_us", b)
      val w = Window.partitionBy(col(key), col("__tb"))
        .orderBy("ts_us", "event_id")
      val d1 = tb
        .withColumn("__prev_ts_s", lag("ts_s", 1).over(w))
        // starts decidable in-bucket: predecessor in the same bucket
        .withColumn("__ns", when(col("__prev_ts_s").isNotNull &&
          (col("ts_s") - col("__prev_ts_s")) > gapSeconds, 1L).otherwise(0L))
        .withColumn("__s_local",
          sum("__ns").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      // per-bucket summary over the SAME exchanged frame (reused)
      val sm = d1.groupBy(col(key), col("__tb")).agg(
        min_by(col("ts_s"), struct(col("ts_us"), col("event_id"))).as("__first_ts"),
        max_by(col("ts_s"), struct(col("ts_us"), col("event_id"))).as("__last_ts"),
        sum("__ns").as("__n_known"))
      val kw = Window.partitionBy(key).orderBy("__tb")
      val seam = sm
        .withColumn("__prev_last", lag("__last_ts", 1).over(kw))
        // does this bucket's first row start a session? (first bucket
        // of a key: yes — same rule as the single window's null-prev)
        .withColumn("__u", when(col("__prev_last").isNull ||
          (col("__first_ts") - col("__prev_last")) > gapSeconds, 1L).otherwise(0L))
        // starts in ALL earlier buckets of this key
        .withColumn("__off", coalesce(sum(col("__n_known") + col("__u"))
          .over(kw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(key), col("__tb"), col("__u"), col("__off"))
      d1.join(seam, Seq(key, "__tb"))
        .withColumn("session_seq", col("__off") + col("__u") + col("__s_local"))
        .select(outCols: _*)
    }
  }
}
