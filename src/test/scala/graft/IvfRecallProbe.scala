package graft

import org.apache.spark.sql.functions._

/** Measures ss_ivf_topk recall@10 and steady-state latency across
  * nprobe settings at a given SF — sizes the nprobe default against
  * the advertised >=0.85 floor. */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    import graft.queries.SimilarityQueries.{K, IvfCells}

    val data = graft.Tables.embeddings(spark, dir)
    val qs = data.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.bruteTopK(data, qs, "vec_id", "embedding", K)
      .localCheckpoint()
    val cent = Similarity.kmeansCentroids(data, "vec_id", "embedding",
      c = IvfCells, iters = 8).localCheckpoint()
    val indexed = Similarity.ivfAssign(data, "embedding", cent).localCheckpoint()

    for (np <- Seq(5, 6, 7, 8)) {
      def run() = Similarity.ivfTopKWithCentroids(indexed, qs, "vec_id",
        "embedding", "cluster", cent, "cluster", "cemb", K, nprobe = np)
      val rec = graft.operators.Audit.withRecall(run(), brute,
        Seq("q_id", "vec_id"))
        .agg(min("recall")).collect()(0).getDouble(0)
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        run().write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
      }
      println(f"IVF $dir nprobe=$np recall@10 $rec%.4f steady-min $best%.3f s")
    }
    spark.stop()
  }
}
