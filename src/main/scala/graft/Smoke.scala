package graft
import org.apache.spark.sql.functions._
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema(); ev.show(2, false)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    li.select("l_shipdate").printSchema()
    val evn = ev.withColumn("ts2", timestamp_micros(col("ts") / 1000 cast "long"))
    evn.select("ts", "ts2").write.mode("overwrite").parquet("/tmp/ev_out")
    li.select("l_shipdate").limit(5).write.mode("overwrite").parquet("/tmp/li_out")
    spark.stop()
  }
}
