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
    * vehicle_id/lat/lon/ts_s (see PositionView). Output one row per valid
    * consecutive pair with dt_s, dist_km, speed_kmh. */
  def speeds(pos: DataFrame,
             maxGapSeconds: Double = MaxGapSeconds,
             maxSpeedKmh: Double = MaxRealisticSpeedKmh): DataFrame = {
    // event_id tie-break: duplicate timestamps per vehicle would make
    // lag() nondeterministic across runs (and vs the oracle) otherwise.
    val w = Window.partitionBy("vehicle_id").orderBy("ts_us", "event_id")
    pos
      .withColumn("prev_lat", lag("lat", 1).over(w))
      .withColumn("prev_lon", lag("lon", 1).over(w))
      .withColumn("prev_ts_s", lag("ts_s", 1).over(w))
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
    * session starts. Single shuffle on the key. */
  def sessionize(pos: DataFrame, key: String, gapSeconds: Double): DataFrame = {
    val w = Window.partitionBy(key).orderBy("ts_us", "event_id")
    pos
      .withColumn("__prev_ts_s", lag("ts_s", 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts_s").isNull ||
          (col("ts_s") - col("__prev_ts_s")) > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_ts_s", "__new_session")
  }
}
