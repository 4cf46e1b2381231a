package graft

/** Prints the ADAPTIVE final physical plan of q5_local_supplier after
  * execution at a given SF — shows what AQE actually picked for the
  * final fact join (runtime broadcast vs shuffled merge). */
object Q5ShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q5_local_supplier")(spark, dir)
    df.collect() // same queryExecution → the adaptive plan finalizes
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
