package graft

/** Sweep: executes every registered non-streaming query at a scale dir
  * and reports each broadcast exchange's actual built row count — a
  * corpus-scaling side being broadcast shows up as a row count that
  * grows with sf. Usage: Test/runMain graft.BroadcastSweep [sfDir]
  */
object BroadcastSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val floor = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val skip = (n: String) => n.startsWith("st_")
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !skip(name)) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        // run the SAME QueryExecution we inspect (df.write would plan a
        // fresh one, leaving these metrics at zero)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val bcasts = helper.collectWithSubqueries(df.queryExecution.executedPlan) {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike =>
            b.metrics.get("numOutputRows").orElse(b.metrics.get("numRows"))
              .map(_.value)
              .getOrElse { println(s"  [$name metrics: ${b.metrics.keys.mkString(",")}]"); -1L }
        }
        val big = bcasts.filter(_ >= floor)
        if (big.nonEmpty)
          println(s"SWEEP $name BIG-BROADCAST rows=${big.mkString(",")}")
        else if (bcasts.nonEmpty)
          println(s"SWEEP $name ok (${bcasts.size} bcast, max=${bcasts.max})")
      } catch {
        case e: Throwable => println(s"SWEEP $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
