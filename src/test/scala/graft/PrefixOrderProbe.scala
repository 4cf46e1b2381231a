package graft

import org.apache.spark.sql.functions._

/** Sizes the AllPairs prefix ORDER choice under zipf (round-19, from
  * TextSkewProbe's dd_ngram_jaccard 2.23x): the shipped prefix is the
  * hash order (fused sort in SortedShingleHashes); Bayardo's canonical
  * order is ascending document frequency, which keeps corpus-hot
  * shingles OUT of every prefix. This measures candidate-join output
  * (the quadratic term) for both orders on the uniform and zipf
  * corpora.
  *
  *   sbt 'Test/runMain graft.PrefixOrderProbe [srcDir]'
  */
object PrefixOrderProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft-sf1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    LmSkewProbe.generate(spark, src, src.stripSuffix("/") + "-zipfdocs")
    val t = graft.queries.DedupQueries.JaccardThreshold
    val n = graft.queries.DedupQueries.ShingleN
    for ((tag, dir) <- Seq("uniform" -> src,
      "zipf" -> (src.stripSuffix("/") + "-zipfdocs"))) {
      val hs = graft.operators.Par.spread(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").as("__id"), col("text").as("__text")))
        .select(col("__id"),
          coalesce(graft.plans.SortedShingleHashes(col("__text"), n),
            array().cast("array<long>")).as("hs"))
        .withColumn("sz", size(col("hs")).cast("long"))
        .localCheckpoint()
      val k = greatest(lit(1),
        (col("sz") - ceil(col("sz") * t) + 1).cast("int"))

      def candCount(pre: org.apache.spark.sql.DataFrame): Long = {
        val a = pre.select(col("__id").as("a_id"), col("sz").as("a_sz"), col("sg"))
        val b = pre.select(col("__id").as("b_id"), col("sz").as("b_sz"), col("sg"))
        a.join(b, Seq("sg"))
          .filter(col("a_id") < col("b_id") &&
            col("a_sz") >= lit(t) * col("b_sz") &&
            col("b_sz") >= lit(t) * col("a_sz"))
          .count()
      }

      val hashPre = hs.select(col("__id"), col("sz"),
        explode(slice(col("hs"), lit(1), k)).as("sg"))
      val c1 = candCount(hashPre)

      val dfc = hs.select(explode(col("hs")).as("sg"))
        .groupBy("sg").agg(count(lit(1)).as("__df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__id").orderBy(col("__df"), col("sg"))
      val dfPre = hs.select(col("__id"), col("sz"), k.as("k"),
        explode(col("hs")).as("sg"))
        .join(dfc, "sg")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("k"))
        .select("__id", "sz", "sg")
      val c2 = candCount(dfPre)
      println(f"PREFIXORDER $tag hash-order cands $c1%,d df-order cands $c2%,d")
    }
    spark.stop()
  }
}
