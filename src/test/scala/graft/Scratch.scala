package graft

import org.apache.spark.sql.DataFrame

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
    import graft.operators.Dedup

    // staged frames, as DedupQueries stages them
    val idx = Dedup.invertedIndex(Dedup.hashShingles(
      Dedup.shingles(Tables.documents(spark, dir), "doc_id", "text", 3)))
      .repartition(col("sg")).localCheckpoint(eager = false)
    val iNew = idx.filter(col("__id") % 5 === 0)
    val iOld = idx.filter(col("__id") % 5 =!= 0)
    val prev = Dedup.connectedComponents(
      Tables.documents(spark, dir).filter(col("doc_id") % 5 =!= 0), "doc_id",
      Dedup.jaccardPairsFromIndex(iOld, 0.8), "a_id", "b_id")
      .localCheckpoint(eager = false)
    val newPairs = Dedup.jaccardPairsAcrossIndex(iNew, iOld, 0.8)
      .select(col("new_id").as("a_id"), col("old_id").as("b_id"))
      .union(Dedup.jaccardPairsFromIndex(iNew, 0.8).select("a_id", "b_id"))
      .localCheckpoint(eager = false)
    time("stage all")(prev.join(newPairs, prev("id") === newPairs("a_id"), "left_anti"))

    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val labels = Dedup.updateComponents(prev, "id", "cluster_id",
        Tables.documents(spark, dir).filter(col("doc_id") % 5 === 0), "doc_id",
        newPairs, "a_id", "b_id")
      println(f"SCRATCH build+loop r$r       ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      time(s"tail r$r") {
        val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        labels.join(sizes, "cluster_id")
          .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
          .orderBy("doc_id")
      }
    }
    spark.stop()
  }
}
