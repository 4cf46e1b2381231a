package graft

import graft.functions.GeoFunctions
import graft.sources.PositionView
import org.apache.spark.sql.functions._

/** Quiet-window probe: geo_nearest_signal with the FIXED r9 cell vs the
  * density-adaptive r10 cell (cellDeg ∝ density^-0.4), at whatever SF
  * SPARK_GRAFT_SF_DIR points to.
  * Run: sbt 'Test/runMain graft.NearestCellProbe'
  */
object NearestCellProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "4").toInt
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val pos = PositionView.fromEvents(Tables.events(spark, dir))
      .select("event_id", "lat", "lon")
    val signals = pos.filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("signal_id"),
        col("lat").as("s_lat"), col("lon").as("s_lon"))
    val nSignals = math.max(1L, Tables.events(spark, dir).count() / 199)
    val fixed = queries.GeoQueries.CellDeg
    val adaptive = math.max(0.002, math.min(0.2,
      fixed * math.pow(500.0 / nSignals.toDouble, 0.4)))
    println(f"signals=$nSignals fixedCell=$fixed%.4f adaptiveCell=$adaptive%.4f")
    Seq("fixed" -> fixed, "adaptive" -> adaptive).foreach { case (tag, cell) =>
      val mins = (1 to rounds).map { r =>
        val t0 = System.nanoTime()
        graft.operators.GeoNearest.nearest(pos, signals, cellDeg = cell,
          originLat = GeoFunctions.KyivBounds._1,
          originLon = GeoFunctions.KyivBounds._3,
          maxAbsLatDeg = GeoFunctions.KyivBounds._2)
          .orderBy("event_id")
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"  $tag round $r: $dt%6.2f s")
        dt
      }
      println(f"PROBE $tag%-9s cell=$cell%.4f min=${mins.min}%6.2f s")
    }
    spark.stop()
  }
}
