package graft
object DdZipfCount {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    for ((tag, dir) <- Seq("uniform" -> "/tmp/graft-sf1", "zipf" -> "/tmp/graft-sf1-zipfdocs")) {
      val n = graft.SparkEntry.queries("dd_ngram_jaccard")(spark, dir).count()
      println(s"DDCOUNT $tag pairs=$n")
    }
    spark.stop()
  }
}
