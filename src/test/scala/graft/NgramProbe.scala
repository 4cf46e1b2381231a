package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Stage breakdown for dd_ngram_jaccard's unstaged plan. Pass a
  * variant name (raw | once | shared) to time ONE variant in a clean
  * JVM — comparing variants inside one session contaminates via cache
  * blocks and GC. Run: sbt 'Test/runMain graft.NgramProbe raw'
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val variant = args.headOption.getOrElse("raw")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val n = queries.DedupQueries.ShingleN
    val th = queries.DedupQueries.JaccardThreshold
    def hsh = Dedup.hashShingles(
      Dedup.shingles(Tables.documents(spark, dir), "doc_id", "text", n))
    def pairs = variant match {
      case "raw" => Dedup.jaccardPairsPrefixRaw(hsh, th)
        .repartition(1).dropDuplicates().sortWithinPartitions("a_id", "b_id")
      case "once" => Dedup.jaccardPairsPrefixOnce(hsh, th)
        .repartition(1).sortWithinPartitions("a_id", "b_id")
    }
    for (r <- 1 to 4) {
      t(s"$variant r$r") { pairs.write.format("noop").mode("overwrite").save() }
    }
    val df = pairs
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Generate") || l.contains("Reused") || l.contains("Stage"))
      .map(_.trim.take(120)).mkString("\n"))
    println("ROWS=" + df.count())
    spark.stop()
  }
}
