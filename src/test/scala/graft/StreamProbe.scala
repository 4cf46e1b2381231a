package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** One-off instrumentation for the st_* bench spread: runs the
  * interval join N times in one JVM and prints per-run wall time plus
  * the per-micro-batch duration breakdown from the progress events.
  * Run: sbt 'Test/runMain graft.StreamProbe'
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val parts = sys.env.get("SPARK_GRAFT_STREAM_PARTS")
    parts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    for (r <- 1 to 6) {
      val joined = StreamOps.intervalJoin(
        StreamOps.eventsStream(spark, dir), "click", "purchase", "1 hour")
        .select(col("user_id"), col("left_id").as("click_id"),
          col("right_id").as("purchase_id"))
      val t0 = System.nanoTime()
      val q = joined.writeStream.format("memory").queryName(s"probe_$r")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress
      println(f"PROBE run $r total $dt%6.2f s, ${prog.length} batches")
      prog.foreach { p =>
        val d = p.durationMs
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"triggerExecution=${d.get("triggerExecution")} " +
          s"addBatch=${d.get("addBatch")} getBatch=${d.get("getBatch")} " +
          s"latestOffset=${d.get("latestOffset")} " +
          s"queryPlanning=${d.get("queryPlanning")} " +
          s"walCommit=${d.get("walCommit")} " +
          s"commitOffsets=${d.get("commitOffsets")} " +
          s"stateRows=${Option(p.stateOperators).map(_.map(_.numRowsTotal).sum)}")
      }
    }
    spark.stop()
  }
}
