package graft

/** Steady-state q5 at both scales — confirms broadcastIfFewRows picks
  * the winning branch at each. */
object Q5BothScalesProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(6)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft-sf1")) {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        SparkEntry.queries("q5_local_supplier")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
      }
      println(f"Q5 $dir steady-min ${best}%6.3f s")
    }
    spark.stop()
  }
}
