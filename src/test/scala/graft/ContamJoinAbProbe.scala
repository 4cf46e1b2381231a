package graft

import org.apache.spark.sql.functions._

/** A/B: tx_contamination's overlap join — planner (broadcasts the
  * distinct train-shingle hash set, 591k longs at sf1) vs hinted
  * shuffle_hash / merge on the shingle key. */
object ContamJoinAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions

    def contam(hint: String): org.apache.spark.sql.DataFrame = {
      val tagged = graft.operators.Dedup
        .shingles(graft.Tables.documents(spark, dir), "doc_id", "text",
          8)
        .withColumn("split", TextFunctions.trainSplit(col("__id")))
      val trainSh0 = tagged.filter(col("split") === "train")
        .select(explode(col("sh")).as("sg0"))
        .select(xxhash64(col("sg0")).as("sg")).distinct()
      val trainSh = if (hint.isEmpty) trainSh0 else trainSh0.hint(hint)
      val hits = tagged.filter(col("split") =!= "train")
        .select(col("__id"), explode(col("sh")).as("sg0"))
        .select(col("__id"), xxhash64(col("sg0")).as("sg"))
        .join(trainSh, Seq("sg"))
        .select(col("__id")).distinct()
        .withColumn("contaminated", lit(true))
      tagged.filter(col("split") =!= "train")
        .select(col("__id").as("doc_id"), col("split"))
        .join(hits.withColumnRenamed("__id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("split"),
          coalesce(col("contaminated"), lit(false)).as("contaminated"))
        .orderBy("doc_id")
    }

    for (h <- Seq("", "shuffle_hash", "merge")) {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        contam(h).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
      }
      val tag = if (h.isEmpty) "planner" else h
      println(f"AB contam[$tag%-14s] steady-min ${best}%6.3f s")
    }
    spark.stop()
  }
}
