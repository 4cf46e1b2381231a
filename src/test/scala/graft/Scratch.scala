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

    val dir = "/root/testdata/sf0.1"
    def nn(cell: Double): DataFrame = {
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
        .orderBy("event_id")
    }
    def reg(): DataFrame =
      SparkEntry.queries("geo_nearest_signal")(spark, dir)

    for (r <- 1 to 3) {
      time(s"fixed0.05 r$r")(nn(0.05))
      time(s"adaptive(query) r$r")(reg())
    }
    spark.stop()
  }
}
