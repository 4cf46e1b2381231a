package graft

/** Skew rehearsal: the per-key window / session / streaming-state
  * families interleaved uniform-vs-zipf IN ONE SESSION (cross-window
  * comparisons on this host are untrustworthy — BASELINE.md's
  * window-sensitivity note), alternating dirs per round so host drift
  * lands on both sides. Reports per-query minima; the uniform/zipf
  * ratio isolates hot-key straggling.
  *
  *   sbt 'Test/runMain graft.SkewProbe [uniformDir] [zipfDir] [rounds]'
  */
object SkewProbe {
  val Families: Seq[String] = Seq(
    "ta_speed_lag", "ta_sessionize", "ta_session_stats",
    "ta_latest_per_vehicle", "ing_poll_lifecycle",
    "st_session_window", "st_ttl_dedup", "st_sessionize")

  /** Connected components over a star edge set derived from the
    * events table: src = user_id (the skewed key), dst = a distinct
    * per-event vertex. A zipf-hot user becomes one giant star hub —
    * diameter 2 (so round count stays fixed) while the hub's edges
    * all hash to ONE partition of the pre-partitioned edge set: the
    * pure hot-partition shape for the min-label join loop. */
  private def ccStar(spark: org.apache.spark.sql.SparkSession,
                     dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir).select(
      col("user_id").as("a"), (col("event_id") + 1000000000L).as("b"))
    val verts = ev.select(col("a").as("vid")).distinct()
      .union(ev.select(col("b").as("vid")))
    graft.operators.Dedup.connectedComponents(verts, "vid", ev, "a", "b")
      .groupBy("cluster_id").count()
  }

  /** Queries whose plans change under the (key, time-bucket) window
    * decomposition (TimeBuckets) — probed additionally with the
    * decomposition FORCED on, in the same session, so the rehearsal
    * measures the escape hatch engaged rather than arguing it. */
  val Decomposable: Seq[String] =
    Seq("ta_speed_lag", "ta_sessionize", "ta_session_stats", "ing_poll_lifecycle")

  /** Threshold forcing the bucketed path at harness scale (the 4M-row
    * default is sized for real deployments; sf1 is ~1M rows). 10k rows
    * → B = min(estRows/10k, parallelism) ≈ the 32 cap. */
  val ForcedBucketRows = "10000"

  def main(args: Array[String]): Unit = {
    val uni = args.headOption.getOrElse("/tmp/graft-sf1")
    val zipf = args.lift(1).getOrElse("/tmp/graft-sf1-zipf")
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val best = scala.collection.mutable.Map[(String, String), Double]()
    val all = Families :+ "cc_star"
    def run(r: Int, tag: String, dir: String, name: String,
            bucketed: Boolean): Unit = {
      if (bucketed)
        sys.props("spark.graft.windowBucketRows") = ForcedBucketRows
      try {
        val t0 = System.nanoTime()
        val df = if (name == "cc_star") ccStar(spark, dir)
          else SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"round $r $tag%-8s $name%-24s $dt%6.2f s")
        val k = (name, tag)
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), dt)
      } finally if (bucketed) sys.props.remove("spark.graft.windowBucketRows")
    }
    for (r <- 1 to rounds; (tag, dir) <- Seq("uniform" -> uni, "zipf" -> zipf)) {
      all.foreach(n => run(r, tag, dir, n, bucketed = false))
      // decomposition forced on, same round, same session: uniB pins
      // its flat-data overhead, zipfB its hot-key payoff
      Decomposable.foreach(n => run(r, tag + "B", dir, n, bucketed = true))
    }
    println("\nPROBE name uniform_min zipf_min ratio")
    all.foreach { n =>
      val u = best((n, "uniform")); val z = best((n, "zipf"))
      println(f"PROBE $n%-24s $u%6.2f $z%6.2f ${z / u}%5.2f")
    }
    println("\nPROBEB name uniB_min zipfB_min ratioB (decomposition forced)")
    Decomposable.foreach { n =>
      val u = best((n, "uniformB")); val z = best((n, "zipfB"))
      println(f"PROBEB $n%-24s $u%6.2f $z%6.2f ${z / u}%5.2f")
    }
    spark.stop()
  }
}
