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

    // original single-window as-of (parallelism = |keys|)
    def oldBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    timeCol: String, valueCols: Seq[String]): DataFrame = {
      val leftCols = left.columns
      val rightNonNull = keyCols.foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
      val payloadType = org.apache.spark.sql.types.StructType(
        valueCols.map(c => right.schema(c).copy(name = c)))
      val taggedRight = rightNonNull.select(
        keyCols.map(col) ++ Seq(col(timeCol), lit(0).as("__side"),
          struct(valueCols.map(col): _*).as("__vals")) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == timeCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
      val taggedLeft = left.select(
        keyCols.map(col) ++ Seq(col(timeCol), lit(1).as("__side"),
          lit(null).cast(payloadType).as("__vals")) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == timeCol).map(col): _*)
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col(timeCol).asc, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val filled = taggedRight.unionByName(taggedLeft)
        .withColumn("__asof", last(col("__vals"), ignoreNulls = true).over(w))
      filled.filter(col("__side") === 1)
        .select(leftCols.map(col) ++
          valueCols.map(c => col(s"__asof.$c").as(c)): _*)
    }

    def pos = sources.PositionView.fromEvents(Tables.events(spark, dir))
    def series = pos
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("ts_h"))
      .agg(round(sum("value"), 2).as("w_temp"))
      .filter(hour(col("ts_h")) % 3 === 0)
      .withColumnRenamed("ts_h", "ts")
    def left = pos.select("event_id", "event_type", "ts")

    def oldQ = oldBackward(left, series, Seq("event_type"), "ts", Seq("w_temp"))
      .select("event_id", "w_temp").orderBy("event_id")
    def newQ = operators.AsOfJoin.backward(left, series, Seq("event_type"), "ts", Seq("w_temp"))
      .select("event_id", "w_temp").orderBy("event_id")

    for (i <- 1 to 4) {
      time(s"old r$i")(oldQ)
      time(s"new r$i")(newQ)
    }
    spark.stop()
  }
}
