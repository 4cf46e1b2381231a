package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Decompose tx_quality_score's per-row cost at sf1: time the full
  * select, then each scoring column alone over the same spread frame.
  */
object QualityScoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base = graft.operators.Par.spread(
      graft.Tables.documents(spark, dir).select("doc_id", "text"))

    def run(tag: String)(cols: Seq[org.apache.spark.sql.Column]): Unit = {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        base.select((col("doc_id") +: cols): _*)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
      }
      println(f"QS $tag%-18s steady-min ${best}%6.3f s")
    }

    run("all4")(Seq(length(col("text")).cast("long").as("n_chars"),
      stopwordRatio(col("text")).as("sr"),
      punctRatio(col("text")).as("pr"),
      meanTokenLen(col("text")).as("mt")))
    run("n_chars")(Seq(length(col("text")).cast("long").as("n_chars")))
    run("stopword_ratio")(Seq(stopwordRatio(col("text")).as("sr")))
    run("punct_ratio")(Seq(punctRatio(col("text")).as("pr")))
    run("mean_token_len")(Seq(meanTokenLen(col("text")).as("mt")))
    run("ws_token_count")(Seq(tokenCount(col("text")).cast("long").as("nt")))
    run("bpe_regex_count")(Seq(bpeTokenCount(col("text")).cast("long").as("nb")))
    spark.stop()
  }
}
