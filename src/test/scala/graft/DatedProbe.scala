package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** One-off phase breakdown for the dated-sink family: times the
  * stream replay, the recovery restart, and the read-back aggregation
  * separately so optimization lands on the phase that actually costs.
  * Run: sbt 'Test/runMain graft.DatedProbe'
  */
object DatedProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm the session/codegen once
    spark.read.parquet(s"$dir/events.parquet").limit(10)
      .write.format("noop").mode("overwrite").save()

    for (r <- 1 to 3) {
      println(s"== round $r: ing_dated_write phases ==")
      val out = "/tmp/graft-probe-ingdated"
      val posDf = graft.sources.PositionView.fromEvents(
        Tables.events(spark, dir))
        .select("event_id", "vehicle_id", "ts", "value")
      t("posDf_scan_noop") {
        posDf.write.format("noop").mode("overwrite").save()
      }
      t("flat_write") {
        posDf.write.mode("overwrite").parquet("/tmp/graft-probe-flat")
      }
      t("shuffle_noop") {
        posDf.withColumn("date_key", date_format(col("ts"), "yyyyMMdd"))
          .repartition(col("date_key"))
          .write.format("noop").mode("overwrite").save()
      }
      t("writeDated") {
        graft.sources.DatedWriter.writeDated(posDf, "ts", out, filesPerDate = 1)
      }
      t("writeDated_expl32") {
        val dated = posDf.withColumn("date_key", date_format(col("ts"), "yyyyMMdd"))
        dated.repartition(32, col("date_key"))
          .write.partitionBy("date_key").mode("overwrite")
          .parquet("/tmp/graft-probe-ingdated32")
      }
      val rb = t("readback_build") {
        graft.sources.DatedWriter.readDated(spark, out)
          .filter(col("date_key") >= "20240105" && col("date_key") <= "20240108")
          .groupBy("date_key")
          .agg(count(lit(1)).as("n"), countDistinct("vehicle_id").as("n_vehicles"),
            round(sum("value"), 2).as("sum_value"))
          .orderBy("date_key")
      }
      t("readback_exec") {
        rb.write.format("noop").mode("overwrite").save()
      }
      if (r == 1) {
        println("-- readback plan --")
        println(rb.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Scan") || l.contains("Partition") ||
            l.contains("PushedFilters")).take(6).mkString("\n"))
      }
    }
    spark.stop()
  }
}
