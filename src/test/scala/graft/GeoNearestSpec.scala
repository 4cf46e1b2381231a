package graft

import graft.functions.GeoFunctions
import graft.operators.GeoNearest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GeoNearest vs the brute-force argmin: exact equality (distance AND
  * id tie-break) on layouts that exercise every pass — dense cells
  * (ring-1), sparse neighborhoods (ring widening), and a layer hole
  * bigger than the widening ring (broadcast net).
  */
class GeoNearestSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // positions across the Kyiv bbox; deterministic pseudo-random spread
  private def positions(n: Int): DataFrame =
    spark.range(1, n + 1).select(
      col("id").as("event_id"),
      (lit(50.3) + (col("id") * 7919 % 3000) / lit(10000.0)).as("lat"),
      (lit(30.2) + (col("id") * 104729 % 6000) / lit(10000.0)).as("lon"))

  private def brute(pos: DataFrame, sig: DataFrame): Map[Long, (Long, Double)] = {
    val d = GeoFunctions.haversineKm(col("lat"), col("lon"), col("s_lat"), col("s_lon"))
    val w = Window.partitionBy("event_id").orderBy(col("dist_km").asc, col("signal_id").asc)
    pos.crossJoin(sig)
      .select(col("event_id"), col("signal_id"), round(d, 6).as("dist_km"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "signal_id", "dist_km")
      .as[(Long, Long, Double)].collect()
      .map { case (e, s, dk) => e -> (s, dk) }.toMap
  }

  private def run(pos: DataFrame, sig: DataFrame, widenRing: Int): Map[Long, (Long, Double)] =
    GeoNearest.nearest(pos, sig, cellDeg = 0.05,
      originLat = 50.3, originLon = 30.2,
      maxAbsLatDeg = 50.6, widenRing = widenRing)
      .as[(Long, Long, Double)].collect()
      .map { case (e, s, dk) => e -> (s, dk) }.toMap

  test("matches brute force on a dense layer (ring-1 resolves)") {
    val pos = positions(400)
    val sig = positions(400).filter(col("event_id") % 7 === 0)
      .select(col("event_id").as("signal_id"),
        col("lat").as("s_lat"), col("lon").as("s_lon"))
    assert(run(pos, sig, widenRing = 8) === brute(pos, sig))
  }

  test("matches brute force on a sparse layer (widening + broadcast net)") {
    val pos = positions(300)
    // 3 signals clustered in one corner: most positions are > ring-1
    // away, and with widenRing=2 (~7 km guarantee) many are past the
    // widening ring too — pass 3 must fire and still be exact
    val sig = Seq(
      (1L, 50.31, 30.21), (2L, 50.312, 30.207), (3L, 50.32, 30.23)
    ).toDF("signal_id", "s_lat", "s_lon")
    assert(run(pos, sig, widenRing = 2) === brute(pos, sig))
  }

  test("equidistant tie goes to the smaller signal_id") {
    val pos = Seq((1L, 50.45, 30.5)).toDF("event_id", "lat", "lon")
    // two signals symmetric in longitude around the position
    val sig = Seq((9L, 50.45, 30.52), (4L, 50.45, 30.48))
      .toDF("signal_id", "s_lat", "s_lon")
    val got = run(pos, sig, widenRing = 8)
    assert(got(1L)._1 === 4L)
  }

  test("ids at the 2^31 bound pack correctly; past it the guard fires") {
    // the sf1 shards carry 900M-wide event-derived ids — pin the full
    // contract: near-bound ids survive packing AND the tie-break (two
    // equidistant signals, larger-id pair member near 2^IdBits-1);
    // unmatched-position rows (forcing pass 2/3 with null candidates)
    // must not overflow the packed multiply (the r17 ANSI regression:
    // a null side's pseudo-distance is the half circumference)
    val top = (1L << GeoNearest.IdBits) - 2
    val pos = Seq((1L, 50.45, 30.5), (2L, 50.58, 30.79)).toDF("event_id", "lat", "lon")
    val sig = Seq((top, 50.45, 30.52), (top - 1, 50.45, 30.48))
      .toDF("signal_id", "s_lat", "s_lon")
    val got = run(pos, sig, widenRing = 2)
    assert(got(1L)._1 === top - 1) // tie -> smaller id, undamaged by packing
    assert(got(2L)._1 === top)     // resolved via the broadcast net, id intact
    val bad = Seq((1L << GeoNearest.IdBits, 50.45, 30.52))
      .toDF("signal_id", "s_lat", "s_lon")
    // surfaces as SparkRuntimeException (raise_error in a broadcast
    // build) or SparkException (task failure) depending on which pass
    // evaluates the guard first — assert on the message, not the class
    val e = intercept[Exception] {
      GeoNearest.nearest(pos, bad, 0.05, 50.3, 30.2, 50.6).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("signal_id outside")), e.toString)
  }

  test("the resolved/unresolved branches read ONE pass-1 computation") {
    // The pass argmins are localCheckpoint'ed (GeoNearest.argmin
    // comment): the resolved and unresolved consumers prune DIFFERENT
    // column sets, so without the checkpoint the optimizer clones the
    // candidate join + argmin into two canonically different subtrees
    // that exchange reuse cannot dedup (the r20 sf10 metrics dump
    // measured the join executed twice = ~2/3 of query core time).
    // With the checkpoint, the outer plan must carry NO copy of the
    // candidate join at all — every branch scans the checkpointed RDD.
    val pos = positions(200)
    val sig = positions(200).filter(col("event_id") % 11 === 0)
      .select(col("event_id").as("signal_id"),
        col("lat").as("s_lat"), col("lon").as("s_lon"))
    val df = GeoNearest.nearest(pos, sig, 0.05, 50.3, 30.2, 50.6)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val joins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    // the only equi-joins allowed in the OUTER plan are the widen-pass
    // probes (whose inputs are checkpoint scans), never a duplicate of
    // the pass-1 candidate join over the raw position input: pass-1
    // lives inside the checkpointed lineage, so no outer join may scan
    // the positions source directly
    val rawSided = joins.filter(_.children.exists(c =>
      c.collectLeaves().exists(_.nodeName.contains("Range"))))
    assert(rawSided.isEmpty,
      s"pass-1 candidate join duplicated into the outer plan:\n$plan")
    val ckptScans = collectWithSubqueries(plan) {
      case s if s.nodeName.contains("ExistingRDD") => s
    }.size
    assert(ckptScans >= 2,
      s"expected the branches to scan the argmin checkpoint:\n$plan")
  }
}
