package graft

import org.apache.spark.sql.functions._

/** Prints the optimizer's sizeInBytes / estimated-row numbers for the
  * pruned orders side of q5 at both scales — calibrates the
  * broadcastIfFewRows threshold. */
object EstProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/graft-sf1")) {
      val o = graft.Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val stats = o.queryExecution.optimizedPlan.stats
      val width = o.schema.fields.map(_.dataType.defaultSize).sum + 8
      val estRows = (stats.sizeInBytes / width).toLong
      val real = o.count()
      println(s"EST $dir sizeInBytes=${stats.sizeInBytes} width=$width " +
        s"estRows=$estRows realRows=$real rowCount=${stats.rowCount}")
    }
    spark.stop()
  }
}
