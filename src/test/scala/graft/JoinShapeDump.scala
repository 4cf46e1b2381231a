package graft

/** Dumps the AQE-final join strategies of the TPC-H-family queries at
  * a given scale dir — which side is broadcast, merged, or hashed.
  * Usage: Test/runMain graft.JoinShapeDump [sfDir] [names...]
  */
object JoinShapeDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q3_shipping_priority", "q_orphan_check",
               "q_order_fill_rate", "q_top_customer_per_nation",
               "q_decile_stats")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan
      println(s"==== $name")
      helper.collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          println(s"  BHJ build=${j.buildSide} left=${j.left.simpleStringWithNodeId()} right=${j.right.simpleStringWithNodeId()}")
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          println(s"  SMJ ${j.joinType} ${j.leftKeys.mkString(",")}")
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          println(s"  SHJ ${j.joinType} build=${j.buildSide}")
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          println(s"  BNLJ ${j.joinType}")
      }
    }
    spark.stop()
  }
}
