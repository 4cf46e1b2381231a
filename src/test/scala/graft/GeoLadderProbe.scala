package graft

import org.apache.spark.sql.functions._

/** Solo A/B for the GeoNearest ring ladder (round-19 verdict item 5):
  * the registry geo_nearest_signal at sf1 spent its residual in the
  * pass-2 ring-widening — 32.3k ring-1 survivors exploded x289 cells
  * (widenRing=8) although every one of them resolves within ring-2
  * distance (p99.9 dist 1.77 km vs safe(2)=2.80 km at the sf1 cell).
  * Variant A is the shipped pre-r19 shape (no mid rings), B the
  * ladder default (midRings=Seq(2)). Interleaved, min of `rounds`.
  *
  *   sbt 'Test/runMain graft.GeoLadderProbe [sfDir] [rounds]'
  */
object GeoLadderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GeoFunctions
    val s = GraftSession.ensureFunctions(spark)

    // mirror the registry query's inputs and adaptive cell exactly
    val q = graft.queries.GeoQueries
    val variants = Seq("A-direct8" -> Seq.empty[Int], "B-ladder2" -> Seq(2))
    val best = scala.collection.mutable.Map[String, Double]()
    var rowsChk = Map[String, Long]()
    for (r <- 1 to rounds; (tag, mids) <- variants) {
      val t0 = System.nanoTime()
      val out = q.nearestWithMidRings(s, dir, mids)
        .agg(count(lit(1)).as("n"), sum("signal_id").as("sid"),
          sum(round(col("dist_km") * 1e6)).as("sd"))
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"XGEO $tag r$r $dt%7.3f s n=${out.getLong(0)} " +
        s"sid=${out.getLong(1)} sd=${out.getDouble(2).toLong}")
      best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), dt)
      val sig = s"${out.getLong(0)}/${out.getLong(1)}/${out.getDouble(2).toLong}"
      rowsChk.get(tag).foreach(_ => ())
      rowsChk += tag -> out.getLong(0)
      // variants must agree cell-for-cell (checksum over ids+dists)
      println(s"XGEO $tag checksum $sig")
    }
    println(f"XGEO MIN A-direct8 ${best("A-direct8")}%7.3f s " +
      f"B-ladder2 ${best("B-ladder2")}%7.3f s " +
      f"speedup ${best("A-direct8") / best("B-ladder2")}%5.2f")
    spark.stop()
  }
}
