package graft

import org.apache.spark.sql.functions._

/** A/B the serve batch write at several coalesce widths: the probe
  * output is narrow (event_id, w_temp), so per-file committer overhead
  * can dominate the delta write — but coalesce folds the probe compute
  * into fewer tasks, so the win is an empirical balance. */
object ServeCoalesceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.AsOfJoin
    import graft.sources.PositionView

    val posDf = PositionView.fromEvents(graft.Tables.events(spark, dir))
    val series = posDf
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("ts_h"))
      .agg(round(sum("value"), 2).as("w_temp"))
      .filter(hour(col("ts_h")) % 3 === 0)
      .withColumnRenamed("ts_h", "ts")
    val packed = AsOfJoin.packSeries(series,
      keyCols = Seq("event_type"), timeCol = "ts",
      valueCols = Seq("w_temp")).persist()
    packed.count()
    val slice = graft.Tables.events(spark, dir)
      .filter(col("event_id") % 4 === 0)
    def probe(b: org.apache.spark.sql.DataFrame) =
      AsOfJoin.probePacked(
        PositionView.fromEvents(b).select("event_id", "event_type", "ts"),
        packed, keyCols = Seq("event_type"), timeCol = "ts",
        valueCols = Seq("w_temp"))
        .select("event_id", "w_temp")
    for (k <- Seq(0, 1, 2, 4, 8)) {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val out = probe(slice)
        val coalesced = if (k == 0) out else out.coalesce(k)
        val t0 = System.nanoTime()
        coalesced.write.mode("overwrite").parquet("/tmp/graft-servefloor/co")
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
      }
      println(f"CO k=$k%2d steady ${best}%6.3f s")
    }
    spark.stop()
  }
}
