package graft

import org.apache.spark.sql.functions._

/** Decomposition probe for tx_lm_perplexity's sf10 growth (round-19
  * scale rehearsal): times each piece of the query separately so a
  * super-linear total can be attributed — (1) the unigram count-table
  * build, (2) the bigram count-table build, (3) the eval explode, and
  * (4) the full scoring tail — at any sf dir.
  *
  *   Test/runMain graft.LmScaleProbe [sfDir] [reps]
  */
object LmScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    val d = () => graft.operators.Par.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"), trainSplit(col("doc_id")).as("split"))
    def time(name: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        spark.sparkContext.setJobDescription(s"lmscale:$name")
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        best = math.min(best, t)
        println(f"LMSCALE $name%-14s rep$i $t%8.2f s")
      }
      println(f"LMSCALE $name%-14s min  $best%8.2f s")
    }
    val train = () => d().filter(col("split") === "train")
    time("uni-build") {
      train().select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
    }
    time("big-build") {
      train().select(explode(wordShingles(col("text"), 2)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c2"))
    }
    time("eval-explode") {
      d().filter(col("split") === "val")
        .select(col("doc_id"), explode(wordShingles(col("text"), 2)).as("b"))
        .withColumn("w1", substring_index(col("b"), " ", 1))
    }
    time("full-query") {
      graft.queries.TextQueries.txLmPerplexity(spark, dir)
    }
    spark.stop()
  }
}
