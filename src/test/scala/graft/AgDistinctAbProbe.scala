package graft

import org.apache.spark.sql.functions._

/** A/B: ag_approx_distinct with and without the Par.spread pre-shuffle
  * (an agg is not a compute-bound parse stage — the partial aggregate
  * already parallelizes on scan splits). */
object AgDistinctAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def body(spread: Boolean) = {
      val base = graft.Tables.events(spark, dir).select("event_type", "user_id")
      val src = if (spread) graft.operators.Par.spread(base) else base
      src.groupBy("event_type")
        .agg(approx_count_distinct("user_id", 0.02).as("approx_users"),
          countDistinct("user_id").as("exact_users"))
        .withColumn("rel_err",
          abs(col("approx_users") - col("exact_users")).cast("double") / col("exact_users"))
        .orderBy("event_type")
    }
    for (sp <- Seq(true, false)) {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        body(sp).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        if (i > 1 && t < best) best = t
      }
      println(f"AGD spread=$sp steady-min $best%6.3f s")
    }
    spark.stop()
  }
}
