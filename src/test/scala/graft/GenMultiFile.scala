package graft

/** One-off: copies an sf dir into an 8-file-per-table layout so the
  * bench can compare single-split vs multi-split source behavior
  * (backs the conditional Par.spread — see PlanShapeSpec).
  *
  *   sbt 'Test/runMain graft.GenMultiFile [srcDir] [dstDir]'
  */
object GenMultiFile {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft-multifile-sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"GEN $t done")
    }
    spark.stop()
  }
}
