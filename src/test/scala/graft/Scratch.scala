package graft

import org.apache.spark.sql.DataFrame

object Scratch {
  def time(name: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions.GeoFunctions
    import graft.sources.PositionView

    def nn(dir: String, cell: Double): DataFrame = {
      val pos = PositionView.fromEvents(Tables.events(spark, dir))
        .select("event_id", "lat", "lon")
      val sig = PositionView.fromEvents(Tables.events(spark, dir))
        .filter(col("event_id") % 199 === 0)
        .select(col("event_id").as("signal_id"),
          col("lat").as("s_lat"), col("lon").as("s_lon"))
      graft.operators.GeoNearest.nearest(pos, sig, cellDeg = cell,
        originLat = GeoFunctions.KyivBounds._1,
        originLon = GeoFunctions.KyivBounds._3,
        maxAbsLatDeg = GeoFunctions.KyivBounds._2)
    }

    for (r <- 1 to 2) {
      for (c <- Seq(0.016, 0.02, 0.025, 0.03, 0.04, 0.05))
        time(f"sf1 cell$c%.3f r$r")(nn("/tmp/graft-sf1", c))
      for (c <- Seq(0.05, 0.07, 0.09))
        time(f"sf01 cell$c%.3f r$r")(nn("/root/testdata/sf0.1", c))
    }
    spark.stop()
  }
}
