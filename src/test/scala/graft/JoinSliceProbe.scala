package graft

import org.apache.spark.sql.functions._

/** st_stream_join drain-shape probe at sf1: ONE AvailableNow batch
  * (watermark never advances mid-batch -> join state never evicts ->
  * per-row state scans grow with the full backlog) vs a time-ranged
  * multi-batch drain (watermark advances between batches, state
  * bounded by the 1 h join window).
  *   sbt 'Test/runMain graft.JoinSliceProbe [dir] [rounds]' */
object JoinSliceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.StreamOps
    def run(tag: String, slices: Int): Seq[String] = {
      val t0 = System.nanoTime()
      val out = StreamOps.runToMemory(spark, ss => StreamOps.intervalJoin(
        if (slices <= 1)
          StreamOps.eventsStreamWide(ss, dir, StreamOps.wideReplayFiles(spark))
        else StreamOps.eventsStreamSliced(ss, dir, slices),
        "click", "purchase", "1 hour")
        .select(col("user_id"), col("left_id").as("click_id"),
          col("right_id").as("purchase_id")),
        s"jsp_$tag", "append", noFlush = true)
        .orderBy("user_id", "click_id", "purchase_id")
      val rows = out.collect().map(_.toString).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      val bs = StreamOps.ReplayMetrics.snapshot.get(s"jsp_$tag")
        .map(b => s"n=${b.n} p50=${b.p50Ms}ms p95=${b.p95Ms}ms").getOrElse("-")
      println(f"JPROBE $tag%-10s $dt%6.2f s rows=${rows.size} [$bs]")
      rows
    }
    val base = run("w1_r0", 1)
    for ((sl, tag) <- Seq(4 -> "x4", 8 -> "x8", 16 -> "x16")) {
      val r = run(tag + "_r0", sl)
      println(s"JPROBE $tag rows-equal: ${r == base}")
    }
    for (r <- 1 to rounds) {
      run(s"w1_r$r", 1); run(s"x8_r$r", 8); run(s"x16_r$r", 16)
    }
    spark.stop()
  }
}
