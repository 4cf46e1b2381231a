package graft

import org.apache.spark.sql.DataFrame

object Scratch {
  def time(name: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.sources.PositionView

    def pos = PositionView.fromEvents(Tables.events(spark, dir))
      .select("event_id", "lat", "lon")
    def sigRaw = PositionView.fromEvents(Tables.events(spark, dir))
      .filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("signal_id"),
        col("lat").as("s_lat"), col("lon").as("s_lon"))
    def nn(cell: Double) = graft.operators.GeoNearest.nearest(pos, sigRaw,
      cellDeg = cell, originLat = 50.3, originLon = 30.2, maxAbsLatDeg = 50.6)

    for (r <- 1 to 3) {
      time(s"cell05 r$r")(nn(0.05))
      time(s"cell03 r$r")(nn(0.03))
      time(s"cell02 r$r")(nn(0.02))
      time(s"cell03+sort r$r")(nn(0.03).orderBy("event_id"))
    }
    spark.stop()
  }
}
