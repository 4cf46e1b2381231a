package graft

import org.apache.spark.sql.functions._

/** Measures the ANN family on the CLUSTERED embeddings variant
  * (GenClustered) — recall@10 AND candidate fraction side by side, for
  * LSH band layouts and IVF nprobe settings. The isotropic corpus
  * forces LSH to buy recall with a ~0.73 candidate fraction (SURVEY
  * §14); on a clustered corpus the same recall must come at a
  * materially lower fraction or the index is not earning its keep.
  *
  *   sbt 'Test/runMain graft.ClusteredRecallProbe [dir] [srcDir]'
  *
  * Generates the clustered dir from srcDir when absent.
  */
object ClusteredRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-clustered")
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/embeddings.parquet")))
      GenClustered.generate(spark, src, dir, clusters = 32)
    import graft.operators.Similarity
    import graft.queries.SimilarityQueries.{K, IvfCells}

    val data = graft.Tables.embeddings(spark, dir)
    val qs = data.filter(col("vec_id") % 50 === 0)
    val n = data.count()
    val nq = qs.count()
    val brute = Similarity.bruteTopK(data, qs, "vec_id", "embedding", K)
      .localCheckpoint()

    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      graft.operators.Audit.withRecall(df, brute, Seq("q_id", "vec_id"))
        .agg(min("recall")).collect()(0).getDouble(0)

    for ((nBits, bands) <- Seq((30, 10), (32, 8), (40, 8), (60, 10))) {
      val rec = recallOf(Similarity.lshTopK(data, qs, "vec_id", "embedding",
        dim = 64, k = K, nBits = nBits, bands = bands))
      val candN = Similarity.lshCandidates(data, qs, "vec_id", "embedding",
        dim = 64, nBits = nBits, bands = bands).count()
      val frac = candN.toDouble / (nq * (n - 1))
      println(f"CLUSTERED lsh r=${nBits / bands} x $bands bands: " +
        f"recall@10(min) $rec%.4f cand_frac $frac%.4f")
    }

    val cent = Similarity.kmeansCentroids(data, "vec_id", "embedding",
      c = IvfCells, iters = 8).localCheckpoint()
    val indexed = Similarity.ivfAssign(data, "embedding", cent).localCheckpoint()
    val sizes = indexed.groupBy("cluster").count().localCheckpoint()
    for (np <- Seq(1, 2, 4, 7)) {
      val rec = recallOf(Similarity.ivfTopKWithCentroids(indexed, qs,
        "vec_id", "embedding", "cluster", cent, "cluster", "cemb", K,
        nprobe = np))
      val mass = Similarity.ivfProbes(qs, "vec_id", "embedding",
        cent, "cluster", "cemb", np)
        .join(sizes, "cluster").agg(sum("count")).collect()(0).getLong(0)
      val frac = mass.toDouble / (nq * n)
      println(f"CLUSTERED ivf C=$IvfCells nprobe=$np: " +
        f"recall@10(min) $rec%.4f cand_frac $frac%.4f")
    }
    spark.stop()
  }
}
