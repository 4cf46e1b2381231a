package graft

/** Prints the per-batch phase breakdown (durationMs) ReplayMetrics
  * records for each streaming replay — where does the ~300-800 ms
  * micro-batch floor actually go (planning vs addBatch vs commits)?
  */
object BatchPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("st_asof_serve", "st_windowed_counts", "st_session_final")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"BP $name total ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      graft.streaming.StreamOps.ReplayMetrics.snapshot.foreach { case (k, v) =>
        if (graft.streaming.StreamOps.ReplayMetrics.details(k).nonEmpty)
          () }
      for (k <- graft.streaming.StreamOps.ReplayMetrics.snapshot.keys.toSeq.sorted;
           d <- graft.streaming.StreamOps.ReplayMetrics.details(k))
        println(s"  [$k] $d")
    }
    spark.stop()
  }
}
