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

    val sf1 = "/tmp/graft-sf1"

    def docs = Tables.documents(spark, sf1)
    def newCount = docs.select(sum(graft.plans.WsTokenCount(col("text")).cast("long")).as("s"))
    def oldCount = docs.select(sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("s"))
    def qf = queries.TextQueries.queries("tx_quality_filter")(spark, sf1)
    def gn = queries.GeoQueries.queries("geo_nearest_signal")(spark, sf1)

    for (i <- 1 to 2) {
      time(s"newCount r$i")(newCount)
      time(s"oldCount r$i")(oldCount)
      time(s"qualityFilter r$i")(qf)
    }
    time("geoNearest r1")(gn)
    time("geoNearest r2")(gn)
    spark.stop()
  }
}
