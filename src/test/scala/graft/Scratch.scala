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
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val df = Seq(
      ("ok", "SGVsbG8gV29ybGQh"),          // valid, padded-multiple already
      ("unpadded", "SGVsbG8gV29ybGQhIQ"),  // valid but unpadded (18 chars)
      ("corrupt", "SGVsbG8!@"),            // non-alphabet chars
      ("short", "A")                        // un-fixable length 1 (+3 pad)
    ).toDF("tag", "b64")
      .withColumn("pad",
        concat(col("b64"), repeat(lit("="), (lit(4) - length(col("b64")) % 4) % 4)))
      .withColumn("bytes", try_to_binary(col("pad"), lit("base64")))
      .withColumn("isnull", col("bytes").isNull)
      .withColumn("len", length(col("bytes")))
    df.show(false)
    // also: does base64() emit padding, and is it plain (non-MIME)?
    Seq(32, 8).toDF("n").select(col("n"),
      base64(expr("repeat(cast('ab' as binary), n)"))).show(false)
    spark.stop()
  }
}
