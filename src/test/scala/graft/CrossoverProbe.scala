package graft

import org.apache.spark.sql.functions._

/** Bucketing-crossover calibration for TimeBuckets.DefaultBucketRows:
  * synthesized streams with a 75% hot key (the zipf(2.5) regime where
  * the decomposition must win), slim (2-long payload) and wide
  * (position-shaped) rows, at growing row counts — lag1 forced
  * single-window (buckets=1) vs forced bucketed (buckets=32), minima
  * over rounds. The engagement threshold is correct when, at its row
  * count, the bucketed side is no slower than single-window for the
  * CHEAPEST per-row operator (the slim lag — every other window family
  * crosses earlier), for BOTH widths at the same ROW count (the point
  * of the width-aware estimate).
  *   sbt 'Test/runMain graft.CrossoverProbe [rounds]' */
object CrossoverProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    // 75% of rows on key 0, the rest spread over 149 keys; ts is a
    // hash-shuffled long so the hot key's window really sorts
    def base(n: Long) = spark.range(n)
      .withColumn("k",
        when(pmod(col("id"), lit(4)) === 0, pmod(col("id"), lit(149)) + 1)
          .otherwise(lit(0L)))
      .withColumn("ts_us", pmod(xxhash64(col("id")), lit(1L << 40)))
      .withColumn("tie", col("id"))
      .withColumn("v", col("id") * 3)
    def slim(n: Long) = base(n).select("k", "ts_us", "tie", "v")
    def wide(n: Long) = base(n)
      .withColumn("lat", col("id") % 3000 / 1e4 + 50.3)
      .withColumn("lon", col("id") % 6000 / 1e4 + 30.2)
      .withColumn("d1", col("id") / 7.0)
      .withColumn("d2", col("id") / 11.0)
      .withColumn("s1", concat(lit("vehicle-payload-"), col("id") % 1000))
      .drop("id")
    def lagged(df: org.apache.spark.sql.DataFrame, b: Int) =
      graft.operators.TimeBuckets.lag1(df, "k", "ts_us", "tie", Seq("v"), buckets = b)
        .groupBy("k").agg(sum(col("v") - coalesce(col("prev_v"), lit(0L))).as("x"))
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"XPROBE $tag $dt%6.3f s")
      dt
    }
    for (r <- 1 to rounds; n <- Seq(1, 2, 4, 8).map(_ * 1000000L)) {
      time(s"slim n=$n b=1  r$r")(lagged(slim(n), 1))
      time(s"slim n=$n b=32 r$r")(lagged(slim(n), 32))
      if (n <= 4000000L) {
        time(s"wide n=$n b=1  r$r")(lagged(wide(n), 1))
        time(s"wide n=$n b=32 r$r")(lagged(wide(n), 32))
      }
    }
    // what the estimate derives at 4M rows for each width (engagement check)
    Seq("slim" -> slim(4000000L), "wide" -> wide(4000000L)).foreach {
      case (tag, df) =>
        println(s"XPROBE estRows $tag = " + graft.operators.TimeBuckets.estimatedRows(df) +
          " width=" + graft.operators.TimeBuckets.estimatedRowWidth(df) +
          " -> B=" + graft.operators.TimeBuckets.bucketCount(df, 0))
    }
    spark.stop()
  }
}
