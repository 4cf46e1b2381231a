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
    // coarse prefilter cell (~polygon-scale): fewer exploded dim rows,
    // same candidate set for a 2-poly layer
    def hitsCoarse = graft.operators.PolyJoin.containsJoin(
      graft.sources.PositionView.fromEvents(Tables.events(spark, dir)),
      "lat", "lon",
      graft.queries.GeoQueries.concavePolys(spark), "poly_id", "verts",
      cellDeg = 0.25, convex = false)
    def vCoarse = hitsCoarse.groupBy("poly_id")
      .agg(count(lit(1)).as("n"),
        countDistinct("vehicle_id").as("n_vehicles"),
        countDistinct("route_id").as("n_routes"))
      .orderBy("poly_id")
    // NO-JOIN literal floor: the layer folded into the scan as one
    // ray-cast expression per ring, unpivoted — the cheapest plan any
    // literal 2-ring layer admits (no broadcast job, no join probe)
    def vLiteral = {
      val p = graft.sources.PositionView.fromEvents(Tables.events(spark, dir))
      val rings = graft.queries.GeoQueries.KyivConcave.map { case (id, ring) =>
        val verts = array(ring.map { case (x, y) =>
          struct(lit(x).as("x"), lit(y).as("y")) }: _*)
        struct(lit(id).as("poly_id"),
          graft.operators.PolyJoin.containsRayCast(col("lat"), col("lon"), verts)
            .as("inside"))
      }
      p.select(col("vehicle_id"), col("route_id"),
          explode(filter(array(rings: _*), r => r("inside"))).as("hit"))
        .select(col("hit.poly_id").as("poly_id"), col("vehicle_id"), col("route_id"))
        .groupBy("poly_id")
        .agg(count(lit(1)).as("n"),
          countDistinct("vehicle_id").as("n_vehicles"),
          countDistinct("route_id").as("n_routes"))
        .orderBy("poly_id")
    }
    // bare scan+pos floor: what ANY plan pays before containment
    def vScan = graft.sources.PositionView.fromEvents(Tables.events(spark, dir))
      .groupBy((col("vehicle_id") % 2).as("k")).agg(count(lit(1)).as("n"))
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"CPROBE $tag ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    println("CPROBE equal old/new: " + (vOld.collect().map(_.toString).sorted.toSeq ==
      vNew.collect().map(_.toString).sorted.toSeq))
    println("CPROBE equal old/coarse: " + (vOld.collect().map(_.toString).sorted.toSeq ==
      vCoarse.collect().map(_.toString).sorted.toSeq))
    println("CPROBE equal old/literal: " + (vOld.collect().map(_.toString).sorted.toSeq ==
      vLiteral.collect().map(_.toString).sorted.toSeq))
    for (r <- 1 to rounds) {
      time(s"old r$r")(vOld); time(s"new r$r")(vNew); time(s"floor r$r")(vFloor)
      time(s"coarse r$r")(vCoarse); time(s"literal r$r")(vLiteral)
      time(s"scan r$r")(vScan)
    }
    spark.stop()
  }
}
