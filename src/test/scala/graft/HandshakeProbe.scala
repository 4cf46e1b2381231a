package graft

/** Times ing_handshake_parse (and friends) steady-state at a scale dir. */
object HandshakeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("ing_handshake_parse", "tx_token_count", "tx_quality_score")) {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
      }
      println(f"HP $name%-22s steady-min ${best}%6.3f s")
    }
    spark.stop()
  }
}
