package graft.queries

import graft.{GraftSession}

import org.apache.spark.sql.functions._

/** Breakdown of the position-envelope JSONL parse: line synthesis vs
  * from_json + explode vs full query.
  * Run: sbt 'Test/runMain graft.ParseProbe'
  */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    spark.read.parquet(s"$dir/events.parquet").limit(10)
      .write.format("noop").mode("overwrite").save()
    for (r <- 1 to 3) {
      println(s"== round $r ==")
      def lines = graft.operators.Par.spreadOrdered(
        graft.Tables.events(spark, dir).select(col("event_id"),
          col("user_id"), col("ts")), col("event_id"))
        .select(col("event_id"),
          IngestQueries.positionEnvelopeLine.as("line"))
      t("lines_only") { lines.write.format("noop").mode("overwrite").save() }
      t("lines_parse") {
        graft.sources.PositionLog.parseLines(lines, col("line"))
          .write.format("noop").mode("overwrite").save()
      }
      t("full_ing_jsonl") {
        IngestQueries.queries("ing_jsonl_positions")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
