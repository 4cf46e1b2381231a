package graft

/** Per-micro-batch phase breakdown of st_asof_serve (serving-tail
  * diagnostics): batch 0 vs steady batches, addBatch vs machinery.
  * Used to verify the pre-stage/warm-probe work (r16): with the warm
  * probe, batch 0's residue is the streaming-batch plan's own codegen
  * (its scan node differs from any batch-mode warm plan), ~350 ms.
  *   sbt 'Test/runMain graft.AsofDetail' */
object AsofDetail {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    // experiment: does a trivial streaming replay (same foreachBatch
    // machinery, unrelated plan) move batch 0's cost? If yes the
    // residue is stream-init; if no it is the asof plan itself.
    if (args.contains("warmstream")) {
      graft.streaming.StreamOps.runBatchTransforms(spark,
        graft.streaming.StreamOps.eventsStreamSliced(spark, "/root/testdata/sf0.001", 1)
          .select(org.apache.spark.sql.functions.col("event_id")),
        "asof_warm")(b => b.limit(1))
      println("ASOF warmstream done")
    }
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.queries.TrafficQueries.stAsofServe(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"ASOF r$r total ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      graft.streaming.StreamOps.ReplayMetrics.details("st_asof_serve")
        .foreach(d => println("ASOF   " + d))
    }
    spark.stop()
  }
}
