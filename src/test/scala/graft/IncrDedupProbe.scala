package graft

import org.apache.spark.sql.functions._

/** Batch-count scaling of st_incremental_dedup: the same documents
  * backlog drained in 1/2/4/8 ranged slices through the identical
  * update-delta pipeline. The registered query's sf1 defense is
  * "4 batches x per-batch state-commit floor" — this probe turns that
  * arithmetic into a measured curve: if wall time is ~linear in the
  * batch count with a slope near the measured stateful replay floor,
  * the cost IS the replay contract; a super-linear slope (e.g.
  * UPDATE-sink write amplification) would be real headroom.
  *   sbt 'Test/runMain graft.IncrDedupProbe [dir] [rounds]' */
object IncrDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def run(slices: Int) = graft.streaming.StreamOps.runUpdateDeltas(spark,
      ss => graft.streaming.StreamOps.documentsStreamSliced(ss, dir, slices)
        .groupBy(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id")),
      s"incr_probe_x$slices", Seq("fp"))
      .orderBy("fp")
    // batch-boundary independence pin: every slicing merges to the
    // same keep-list (r15 spec pins 1 == 4; assert all four here)
    val ref = run(1).collect().map(_.toString).sorted.toSeq
    Seq(2, 4, 8).foreach { n =>
      val got = run(n).collect().map(_.toString).sorted.toSeq
      println(s"IPROBE equal x1==x$n: " + (ref == got))
    }
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"IPROBE $tag ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    for (r <- 1 to rounds; n <- Seq(1, 2, 4, 8)) time(s"x$n r$r")(run(n))
    spark.stop()
  }
}
