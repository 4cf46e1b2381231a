package graft

import graft.operators.Dedup
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Phase timer for dd_cluster_incr: where do its ~3 s go at sf0.1?
  * Run: sbt 'Test/runMain graft.ClusterIncrProbe'
  */
object ClusterIncrProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val sh = Dedup.shingles(Tables.documents(spark, dir), "doc_id", "text",
        DedupQueries.ShingleN).localCheckpoint(eager = false)
      t("shingles-materialize")(sh.count())
      val shOld = sh.filter(col("__id") % 5 =!= 0)
      val shNew = sh.filter(col("__id") % 5 === 0)
      val oldPairs = t("old-pairs")(
        Dedup.jaccardPairsFromShingles(shOld, DedupQueries.JaccardThreshold)
          .localCheckpoint())
      val prev = t("prev-CC")(
        Dedup.connectedComponents(
          Tables.documents(spark, dir).filter(col("doc_id") % 5 =!= 0), "doc_id",
          oldPairs, "a_id", "b_id"))
      val newPairs = t("new-pairs")(
        Dedup.jaccardPairsAcrossShingles(shNew, shOld, DedupQueries.JaccardThreshold)
          .select(col("new_id").as("a_id"), col("old_id").as("b_id"))
          .union(Dedup.jaccardPairsFromShingles(shNew, DedupQueries.JaccardThreshold)
            .select("a_id", "b_id")).localCheckpoint())
      val labels = t("updateComponents")(
        Dedup.updateComponents(prev, "id", "cluster_id",
          Tables.documents(spark, dir).filter(col("doc_id") % 5 === 0), "doc_id",
          newPairs, "a_id", "b_id"))
      t("sizes+sort")(
        labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
          .join(labels, "cluster_id").count())
    }
    spark.stop()
  }
}
