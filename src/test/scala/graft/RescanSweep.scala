package graft

/** Sweep: count parquet scans per source table in each registered
  * batch query's executed plan (ReusedExchange/cached subtrees don't
  * re-scan). A table scanned 3+ times means a branch re-derives a
  * shared lineage — sometimes a documented trade (tx_contamination's
  * three shingle branches), sometimes a missed checkpoint.
  */
object RescanSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    for (name <- SparkEntry.queries.keys.toSeq.sorted
         if !name.startsWith("st_")) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val scans = helper.collectWithSubqueries(df.queryExecution.executedPlan) {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.headOption
              .map(_.getName).getOrElse("?")
        }
        val counts = scans.groupBy(identity).view.mapValues(_.size)
          .filter(_._2 >= 3).toMap
        if (counts.nonEmpty)
          println(s"RESCAN $name ${counts.mkString(",")}")
      } catch {
        case e: Throwable => println(s"RESCAN $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
