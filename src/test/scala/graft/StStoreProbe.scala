package graft

/** In-session A/B of the state-store provider for the two most
  * expensive sf1 stream replays (st_stream_join, st_session_final):
  * default HDFSBackedStateStoreProvider (in-memory map + delta files
  * on the tmpfs checkpoint) vs RocksDB. The provider conf is set on
  * the PARENT session and inherited by each replay's child session.
  *   sbt 'Test/runMain graft.StStoreProbe [dir] [rounds]' */
object StStoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val Rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val default = spark.conf.get(key, "")
    def run(tag: String, name: String, rocks: Boolean): Unit = {
      if (rocks) spark.conf.set(key, Rocks)
      else if (default.nonEmpty) spark.conf.set(key, default)
      else spark.conf.unset(key)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val bs = graft.streaming.StreamOps.ReplayMetrics.snapshot
          .get(name + "_sink").map(b => s"n=${b.n} p50=${b.p50Ms}ms p95=${b.p95Ms}ms")
          .getOrElse("-")
        println(f"SPROBE $tag $name%-18s $dt%6.2f s  [$bs]")
      } catch { case e: Throwable =>
        println(s"SPROBE $tag $name FAILED: ${e.getClass.getSimpleName} ${e.getMessage.take(120)}")
      }
    }
    for (r <- 1 to rounds; n <- Seq("st_stream_join", "st_session_final")) {
      run(s"hdfs r$r", n, rocks = false)
      run(s"rocks r$r", n, rocks = true)
    }
    spark.stop()
  }
}
