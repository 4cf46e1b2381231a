package graft

import org.apache.spark.sql.functions._

/** A/B: q_bucket_join's steady-state shape at sf1.
  *
  * Variables: bucket count (8 = committed, 32 = one per core) and
  * join strategy (planner-free, which picks broadcast at sf1 file
  * sizes, vs forced co-located sort-merge via a disabled broadcast
  * threshold). The committed shape reads 8 buckets -> 8 scan tasks on
  * a 32-core host; the probe measures whether the parallelism ceiling
  * or the broadcast build dominates the 1.1 s steady-state.
  */
object BucketAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")

    def stage(buckets: Int): (String, String) = {
      val (ot, lt) = (s"ab_ord_${buckets}_$key", s"ab_li_${buckets}_$key")
      graft.sources.Bucketing.writeBucketed(
        graft.Tables.orders(spark, dir)
          .select("o_orderkey", "o_orderpriority"), ot, "o_orderkey", buckets)
      graft.sources.Bucketing.writeBucketed(
        graft.Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        lt, "o_orderkey", buckets)
      (ot, lt)
    }

    def run(tag: String, ot: String, lt: String, bcast: Boolean): Unit = {
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      if (!bcast) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        graft.sources.Bucketing.bucketJoin(spark, ot, lt, "o_orderkey")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
          .coalesce(1).sortWithinPartitions("o_orderpriority")
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
        println(f"AB $tag%-28s run$i ${s}%6.3f s")
      }
      println(f"AB $tag%-28s steady-min ${best}%6.3f s")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }

    val (o8, l8) = stage(8)
    val (o32, l32) = stage(32)
    run("b8+broadcast(committed)", o8, l8, bcast = true)
    run("b8+smj", o8, l8, bcast = false)
    run("b32+broadcast", o32, l32, bcast = true)
    run("b32+smj", o32, l32, bcast = false)
    spark.stop()
  }
}
