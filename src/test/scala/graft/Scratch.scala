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
    import graft.sources.PositionView

    val dir = "/root/testdata/sf0.1"
    val out = "/tmp/graft-stream-dated/_root_testdata_sf0.1"
    def srcStream = StreamOps.eventsStream(spark, dir)
      .select(col("event_id"), col("user_id").as("vehicle_id"),
        timestamp_micros(expr(PositionView.TsUsSql)).as("ts"),
        col("value"))

    def runAt(parts: Int): Unit = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, parts.toString)
      try StreamOps.runToDated(spark, srcStream, "ts", out)
      finally spark.conf.set(key, prev)
    }

    def full = queries.MiscQueries.queries("st_dated_sink")(spark, dir)
    def fullIng = queries.IngestQueries.queries("ing_dated_write")(spark, dir)

    for (i <- 1 to 3) {
      timeU(s"st.run@4 r$i") { runAt(4) }
      timeU(s"st.run@32 r$i") { runAt(32) }
      timeU(s"st.full r$i") { full.write.format("noop").mode("overwrite").save() }
      timeU(s"ing.full r$i") { fullIng.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
