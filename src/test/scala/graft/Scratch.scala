package graft

import org.apache.spark.sql.DataFrame

/** Dev scratch for stage-level timing — not part of the library. */
object Scratch {
  def time(name: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions.{HashFunctions, TextFunctions}
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)

    def sh = graft.operators.Par.spread(
      docs.select(col("doc_id").as("__id"), col("text").as("__text")))
      .select(col("__id"), TextFunctions.shingleSet(col("__text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .filter(col("sz") > 0)
    def hashed = sh.select(col("__id"), HashFunctions.shingleHashes(col("sh")).as("__hs"))
    def sig = hashed.select(col("__id"), HashFunctions.minhashFromHashes(col("__hs"), 64).as("sig"))
    def bandDf = sig
      .select(col("__id"), explode(HashFunctions.bandHashes(col("sig"), 16, 4)).as("bh"))
      .select(col("__id"), col("bh.band").as("band"), col("bh.h").as("h"))
    def bounded = bandDf
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("band", "h")))
      .filter(col("__bn") <= 1000).drop("__bn")
    def cand = bounded.select(col("band"), col("h"), col("__id").as("a_id"))
      .join(bounded.select(col("band"), col("h"), col("__id").as("b_id")), Seq("band", "h"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    for (r <- 1 to 2) {
      time(s"hashed r$r")(hashed)
      time(s"sig r$r")(sig)
      time(s"bands r$r")(bandDf)
      time(s"bounded r$r")(bounded)
      time(s"cand r$r")(cand)
      time(s"full r$r")(graft.queries.DedupQueries.ddMinhashLsh(spark, dir))
      time(s"simhash_full r$r")(graft.queries.DedupQueries.ddSimhash(spark, dir))
    }
    spark.stop()
  }
}
