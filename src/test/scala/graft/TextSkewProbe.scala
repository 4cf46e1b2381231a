package graft

/** Zipf-skew rehearsal for the SHINGLE/NGRAM-keyed text families
  * (round-19 verdict item 7): LmSkewProbe covered tx_lm_perplexity's
  * unigram join under a zipf(1)-worded corpus, but the inverted-index
  * joins of dd_ngram_jaccard / tx_contamination and the groupBys of
  * tx_ngram_freq / tx_repetition were only ever skew-probed on events
  * (GenSkew). This reuses LmSkewProbe's deterministic zipf documents
  * clone (top word ~12% of the stream vs ~0.34% uniform) and
  * interleaves uniform-vs-zipf minima per query in ONE session,
  * alternating order per round so host drift lands on both sides.
  * Zipf also concentrates SHINGLES (a hot 8-gram of hot words), so a
  * bucket-capped index or a salted agg shows its worth — or its gap —
  * here. Acceptance band: zipf/uniform <= 1.6x per query, matching
  * the other skew families.
  *
  *   sbt 'Test/runMain graft.TextSkewProbe [srcDir] [rounds]'
  */
object TextSkewProbe {
  val Keys = Seq("dd_ngram_jaccard", "tx_contamination", "tx_ngram_freq",
    "tx_repetition")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft-sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val dst = src.stripSuffix("/") + "-zipfdocs"
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    LmSkewProbe.generate(spark, src, dst)
    val all = graft.SparkEntry.queries
    val best = scala.collection.mutable.Map[(String, String), Double]()
    for (r <- 1 to rounds; (tag, dir) <- {
      val sides = Seq("uniform" -> src, "zipf" -> dst)
      if (r % 2 == 0) sides.reverse else sides
    }; k <- Keys) {
      val t0 = System.nanoTime()
      all(k)(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TEXTSKEW $tag $k r$r $dt%6.3f s")
      best((tag, k)) = math.min(best.getOrElse((tag, k), Double.MaxValue), dt)
    }
    for (k <- Keys) {
      val (u, z) = (best(("uniform", k)), best(("zipf", k)))
      println(f"TEXTSKEW ratio $k zipf/uniform ${z / u}%5.2f " +
        f"(uniform $u%6.3f s, zipf $z%6.3f s)")
    }
    spark.stop()
  }
}
