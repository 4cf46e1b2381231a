package graft

import org.apache.spark.sql.functions._

/** A/B probes for ag_approx_distinct's aggregate shape.
  *
  * r16: with vs without the Par.spread pre-shuffle (an agg is not a
  * compute-bound parse stage — the partial aggregate already
  * parallelizes on scan splits; spread lost by ~0.33 s sf0.1).
  *
  * r19: MIXED (countDistinct + approx side by side — rewrites to a
  * two-level aggregate whose level-1 rows each carry the 410-long
  * partial HLL++ buffer through the exchange) vs DEDUP-FIRST (distinct
  * pairs shuffled bare, both aggregates over the deduped rows). The
  * probe also asserts the two shapes return IDENTICAL rows — count
  * over distinct pairs is countDistinct, and the HLL sketch is
  * insertion-idempotent.
  */
object AgDistinctAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def relErr(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rel_err",
        abs(col("approx_users") - col("exact_users")).cast("double") / col("exact_users"))
      .orderBy("event_type")
    def mixed(spread: Boolean) = {
      val base = graft.Tables.events(spark, dir).select("event_type", "user_id")
      val src = if (spread) graft.operators.Par.spread(base) else base
      relErr(src.groupBy("event_type")
        .agg(approx_count_distinct("user_id", 0.02).as("approx_users"),
          countDistinct("user_id").as("exact_users")))
    }
    def dedupFirst = relErr(
      graft.Tables.events(spark, dir).select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(approx_count_distinct("user_id", 0.02).as("approx_users"),
          count("user_id").as("exact_users")))
    val shapes = Seq(
      "mixed+spread" -> (() => mixed(true)),
      "mixed" -> (() => mixed(false)),
      "dedup-first" -> (() => dedupFirst))
    // result identity first: same rows from both aggregate shapes
    val a = mixed(false).collect().map(_.toString).toSeq
    val b = dedupFirst.collect().map(_.toString).toSeq
    require(a == b, s"shapes disagree:\n  mixed=$a\n  dedup=$b")
    println("AGD shapes row-identical: " + a.mkString("; "))
    for ((name, body) <- shapes) {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        body().write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        if (i > 1 && t < best) best = t
      }
      println(f"AGD $name%-13s steady-min $best%6.3f s")
    }
    spark.stop()
  }
}
