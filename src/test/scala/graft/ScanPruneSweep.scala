package graft

/** Sweep: for every registered non-streaming query, report each
  * parquet scan's read-schema width vs its table width — a scan
  * reading (nearly) all columns of a wide table either needs them or
  * lost its pruning. Usage: Test/runMain graft.ScanPruneSweep [sfDir]
  */
object ScanPruneSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val widths = Map("lineitem" -> 16, "orders" -> 9, "events" -> 6,
      "customer" -> 8, "documents" -> 3, "embeddings" -> 2, "part" -> 9,
      "supplier" -> 7, "nation" -> 4, "region" -> 3)
    for (name <- SparkEntry.queries.keys.toSeq.sorted
         if !name.startsWith("st_")) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val scans = helper.collectWithSubqueries(df.queryExecution.executedPlan) {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            val table = s.relation.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
            (table, s.schema.fieldNames.length)
        }
        val flagged = scans.filter { case (t, n) =>
          widths.get(t).exists(w => w >= 6 && n >= w - 1) }
        if (flagged.nonEmpty)
          println(s"PRUNE $name WIDE-SCAN ${flagged.mkString(",")}")
      } catch {
        case e: Throwable => println(s"PRUNE $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
