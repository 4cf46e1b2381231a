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
    import graft.operators.Dedup
    import graft.functions.VectorFunctions

    val dir = "/root/testdata/sf0.1"
    def emb = Tables.embeddings(spark, dir)
    def lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.45)
    def sigOnly = graft.operators.Par.spread(
      emb.select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("emb")))
      .withColumn("sig", VectorFunctions.hyperplaneSigPre(col("emb"), 32, 64))
      .select("vec_id", "sig")

    for (r <- 1 to 3) {
      time(s"sig-only r$r")(sigOnly)
      time(s"lsh-pairs r$r")(lsh)
      time(s"registered r$r")(
        graft.queries.DedupQueries.ddEmbeddingLsh(spark, dir))
    }
    spark.stop()
  }
}
