package graft

import org.apache.spark.sql.functions._

/** Same-session A/B: countDistinct-over-raw-join (Expand x3, the old
  * geo_poly_concave shape) vs the two-level combo-collapse aggregate,
  * plus the bare containment-join floor.
  *   sbt 'Test/runMain graft.ConcaveProbe [dir] [rounds]' */
object ConcaveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def hits = graft.operators.PolyJoin.containsJoin(
      graft.sources.PositionView.fromEvents(Tables.events(spark, dir)),
      "lat", "lon",
      graft.queries.GeoQueries.concavePolys(spark), "poly_id", "verts",
      cellDeg = graft.queries.GeoQueries.CellDeg, convex = false)
    def vOld = hits.groupBy("poly_id")
      .agg(count(lit(1)).as("n"),
        countDistinct("vehicle_id").as("n_vehicles"),
        countDistinct("route_id").as("n_routes"))
      .orderBy("poly_id")
    def vNew = hits.groupBy("poly_id", "vehicle_id", "route_id")
      .agg(count(lit(1)).as("__n"))
      .groupBy("poly_id")
      .agg(sum("__n").as("n"),
        countDistinct("vehicle_id").as("n_vehicles"),
        countDistinct("route_id").as("n_routes"))
      .orderBy("poly_id")
    def vFloor = hits.groupBy("poly_id").agg(count(lit(1)).as("n")).orderBy("poly_id")
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"CPROBE $tag ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    println("CPROBE equal: " + (vOld.collect().map(_.toString).sorted.toSeq ==
      vNew.collect().map(_.toString).sorted.toSeq))
    for (r <- 1 to rounds) { time(s"old r$r")(vOld); time(s"new r$r")(vNew); time(s"floor r$r")(vFloor) }
    spark.stop()
  }
}
