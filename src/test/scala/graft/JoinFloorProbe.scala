package graft

/** Probe: where do q_bucket_join's and q5_local_supplier's sf1
  * seconds go? Times N repeats (first pays one-time staging for the
  * bucketed tables) and prints the formatted plan of the steady-state
  * run. Usage: Test/runMain graft.JoinFloorProbe [sfDir] [repeats]
  */
object JoinFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("q_bucket_join", "q5_local_supplier",
                     "q3_shipping_priority", "q_orphan_check")) {
      val q = SparkEntry.queries(name)
      var best = Double.MaxValue
      for (i <- 1 to n) {
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
        println(f"PROBE $name%-22s run$i%d ${s}%6.3f s")
      }
      println(f"PROBE $name%-22s steady-min ${best}%6.3f s")
      if (name == "q_bucket_join" || name == "q5_local_supplier")
        q(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
