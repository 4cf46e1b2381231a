package graft

import org.apache.spark.sql.DataFrame

object Scratch {
  def time(name: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window

    val dir = "/root/testdata/sf0.1"
    def small(df: DataFrame, cols: String*) =
      df.repartition(1).sortWithinPartitions(cols.head, cols.tail: _*)

    // q_decile_stats: current vs projected-input + small-sort
    def decCur = queries.TpchQueries.queries("q_decile_stats")(spark, dir)
    def decNew = {
      val slim = Tables.orders(spark, dir).select("o_totalprice", "o_orderkey")
      small(graft.operators.RankOps.exactNtile(slim,
        "o_totalprice", "o_orderkey", 10, "decile")
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 2).as("min_price"),
          round(max("o_totalprice"), 2).as("max_price"),
          (round(sum("o_totalprice"), 2) / count(lit(1))).as("avg_price")),
        "decile")
    }

    // q5: current vs broadcast customer
    def q5Cur = queries.TpchQueries.queries("q5_local_supplier")(spark, dir)
    def q5New = {
      val l = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      val sup = Tables.supplier(spark, dir)
      val n = Tables.nation(spark, dir)
      val r = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .repartition(1)
        .sortWithinPartitions(col("revenue").desc, col("n_name").asc)
    }

    // ta_asof_weather / ta_weather_corr: small-sort finish
    def asofCur = queries.TrafficQueries.queries("ta_asof_weather")(spark, dir)
    def corrCur = queries.TrafficQueries.queries("ta_weather_corr")(spark, dir)
    def topcCur = queries.TpchQueries.queries("q_top_customer_per_nation")(spark, dir)

    for (i <- 1 to 3) {
      time(s"decCur r$i")(decCur)
      time(s"decNew r$i")(decNew)
      time(s"q5Cur r$i")(q5Cur)
      time(s"q5New r$i")(q5New)
      time(s"asofCur r$i")(asofCur)
      time(s"corrCur r$i")(corrCur)
      time(s"topcCur r$i")(topcCur)
    }
    // row identity
    def rows(df: DataFrame) = df.collect().map(_.toString).toSeq
    println(s"SCRATCH dec identical=${rows(decCur) == rows(decNew)}")
    println(s"SCRATCH q5 identical=${rows(q5Cur) == rows(q5New)}")
    spark.stop()
  }
}
