package graft

import org.apache.spark.sql.functions._

/** Decompose st_asof_serve's steady per-batch cost: run the SAME
  * probe+write work as one micro-batch, but as a plain batch job over
  * one staged slice — the difference to the in-stream addBatch is the
  * micro-batch engine's own per-batch machinery.
  */
object ServeFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
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

    // one quarter of events = one replay slice's worth
    val slice = graft.Tables.events(spark, dir)
      .filter(col("event_id") % 4 === 0)

    def probe(b: org.apache.spark.sql.DataFrame) =
      AsOfJoin.probePacked(
        PositionView.fromEvents(b).select("event_id", "event_type", "ts"),
        packed, keyCols = Seq("event_type"), timeCol = "ts",
        valueCols = Seq("w_temp"))
        .select("event_id", "w_temp")

    var bestW = Double.MaxValue
    var bestN = Double.MaxValue
    var bestU = Double.MaxValue
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      probe(slice).write.mode("overwrite")
        .parquet("/tmp/graft-servefloor/out")
      val tw = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      probe(slice).write.format("noop").mode("overwrite").save()
      val tn = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      probe(slice).write.mode("overwrite")
        .option("compression", "none")
        .parquet("/tmp/graft-servefloor/outnone")
      val tu = (System.nanoTime() - t2) / 1e9
      if (i > 1 && tu < bestU) bestU = tu
      if (i > 1) { if (tw < bestW) bestW = tw; if (tn < bestN) bestN = tn }
      println(f"SF run$i parquet ${tw}%6.3f s  noop ${tn}%6.3f s")
    }
    println(f"SF steady: probe+parquet ${bestW}%6.3f s  probe+noop ${bestN}%6.3f s  probe+parquet-nocodec ${bestU}%6.3f s")
    spark.stop()
  }
}
