package graft

import org.apache.spark.sql.DataFrame

object Scratch {
  def timeU(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamOps

    val dir = "/root/testdata/sf0.1"

    def full = queries.MiscQueries.queries("st_recover_buffered")(spark, dir)

    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val out = "/tmp/graft-stream-recover/" + key
    val ckpt = "/tmp/graft-stream-recover-ckpt/" + key
    def src = StreamOps.eventsStreamSliced(spark, dir, 4)
      .select(col("event_id"), col("user_id").as("vehicle_id"),
        timestamp_micros(expr(graft.sources.PositionView.TsUsSql)).as("ts"),
        col("value"))

    for (i <- 1 to 3) {
      timeU(s"run1(fail) r$i") {
        try StreamOps.runToDatedRecoverable(spark, src, "ts", out, ckpt,
          failAtBatch = Some(1L), fresh = true)
        catch { case _: StreamOps.PlantedStreamFailure => () }
      }
      timeU(s"run2(recover) r$i") {
        StreamOps.runToDatedRecoverable(spark, src, "ts", out, ckpt)
      }
      timeU(s"readback r$i") {
        graft.sources.DatedWriter.readDated(spark, out)
          .groupBy("date_key")
          .agg(count(lit(1)).as("n"), countDistinct("vehicle_id").as("n_vehicles"),
            round(sum("value"), 2).as("sum_value"))
          .orderBy("date_key")
          .write.format("noop").mode("overwrite").save()
      }
      timeU(s"full r$i") { full.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
