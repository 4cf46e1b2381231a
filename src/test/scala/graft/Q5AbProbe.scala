package graft

import org.apache.spark.sql.functions._

/** A/B: q5's first join (lineitem x orders) — planner-chosen broadcast
  * of the 1.5M-row pruned orders side vs hinted shuffle-hash vs hinted
  * sort-merge, dims always broadcast. Also times q_bucket_join's
  * hinted merge shape at the committed 8 buckets for confirmation.
  */
object Q5AbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q5(hint: String): org.apache.spark.sql.DataFrame = {
      val l = graft.Tables.lineitem(spark, dir)
      val o0 = graft.Tables.orders(spark, dir)
      val o = if (hint.isEmpty) o0 else o0.hint(hint)
      val c = graft.Tables.customer(spark, dir)
      val sup = graft.Tables.supplier(spark, dir)
      val n = graft.Tables.nation(spark, dir)
      val r = graft.Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(graft.operators.Par.broadcastIfSmall(c),
          col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .coalesce(1)
        .sortWithinPartitions(col("revenue").desc, col("n_name").asc)
    }

    def run(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
        println(f"AB $tag%-24s run$i ${s}%6.3f s")
      }
      println(f"AB $tag%-24s steady-min ${best}%6.3f s")
    }

    run("q5+planner(committed)")(q5(""))
    run("q5+shuffle_hash")(q5("shuffle_hash"))
    run("q5+merge")(q5("merge"))
    run("q_bucket_join+mergehint")(
      SparkEntry.queries("q_bucket_join")(spark, dir))
    spark.stop()
  }
}
