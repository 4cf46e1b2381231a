package graft

import org.apache.spark.sql.functions._

/** Skew rehearsal for the TEXT-keyed joins (r17 item 5): the synthetic
  * documents corpus is UNIFORM-worded (310-token vocab, top token
  * ~0.34% of 2.7M tokens at sf1 — measured), so tx_lm_perplexity's
  * `w1 === w` unigram merge join has never met the "the"-class hot key
  * a REAL corpus sends it. This probe derives a zipf(1)-worded variant
  * of the same corpus — same doc ids, same token counts per doc, each
  * token remapped by deterministic inverse-CDF over the same vocab
  * ranked hottest-first (top word ~12% of the stream, ~35x the uniform
  * share) — and interleaves uniform-vs-zipf runs of tx_lm_perplexity
  * in ONE session, alternating per round so host drift lands on both
  * sides (the SkewProbe discipline). The uniform/zipf minima ratio
  * isolates hot-key straggling in the count joins; <= 1.6x matches the
  * acceptance band of the other skew families.
  *
  *   sbt 'Test/runMain graft.LmSkewProbe [srcDir] [rounds]'
  */
object LmSkewProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft-sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val dst = src.stripSuffix("/") + "-zipfdocs"
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst)
    val best = scala.collection.mutable.Map[String, Double]()
    for (r <- 1 to rounds; (tag, dir) <- {
      // alternate order per round: host drift decorrelates from side
      val sides = Seq("uniform" -> src, "zipf" -> dst)
      if (r % 2 == 0) sides.reverse else sides
    }) {
      val t0 = System.nanoTime()
      queries.TextQueries.queries("tx_lm_perplexity")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"LMSKEW $tag r$r $dt%6.3f s")
      best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), dt)
    }
    println(f"LMSKEW ratio zipf/uniform ${best("zipf") / best("uniform")}%5.2f " +
      f"(uniform ${best("uniform")}%5.3f s, zipf ${best("zipf")}%5.3f s)")
    spark.stop()
  }

  /** Zipf-worded clone of `src`: every table copied verbatim except
    * documents, whose text is re-synthesized token-by-token — token i
    * of doc d becomes vocab(zipfIdx(xxhash64(d, i))), with vocab the
    * corpus's own tokens ranked by frequency (hottest = rank 1) and
    * zipfIdx the closed-form zipf(1) inverse CDF r = exp(u·lnV)
    * (P(rank 1) = ln2/lnV ≈ 12% at V=310). Deterministic: no RNG. */
  def generate(spark: org.apache.spark.sql.SparkSession,
               src: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    if (Files.isRegularFile(Paths.get(s"$dst/documents.parquet"))) return
    Files.createDirectories(Paths.get(dst))
    graft.Tables.names.filterNot(_ == "documents").foreach { t =>
      val p = Paths.get(s"$src/$t.parquet")
      if (Files.isRegularFile(p))
        Files.copy(p, Paths.get(s"$dst/$t.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
    }
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val vocab = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").count()
      .orderBy(desc("count"), col("w"))
      .collect().map(_.getString(0))           // generator tool: tiny vocab
    val v = vocab.length
    val vocabLit = array(vocab.map(lit(_)).toIndexedSeq: _*)
    val lnV = math.log(v.toDouble)
    def zipfTok(docId: org.apache.spark.sql.Column,
                i: org.apache.spark.sql.Column) = {
      val u = (pmod(xxhash64(docId, i), lit(1000000L)).cast("double") + 0.5) /
        lit(1000000.0)
      // floor, not ceil: exp(u·lnV) > 1 for all u > 0, so ceil never
      // yields rank 1 and the hottest word would go UNSAMPLED (r18
      // review finding); floor gives P(rank 1) = ln2/lnV as documented
      val rank = least(greatest(floor(exp(u * lit(lnV))).cast("int"), lit(1)),
        lit(v))
      element_at(vocabLit, rank)
    }
    val out = docs.withColumn("text",
      array_join(
        transform(split(trim(col("text")), "\\s+"),
          (_, i) => zipfTok(col("doc_id"), i)),
        " "))
    val stage = s"$dst/_stage_documents"
    out.coalesce(1).write.mode("overwrite").parquet(stage)
    import scala.jdk.CollectionConverters._
    val part = Files.list(Paths.get(stage)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written for documents"))
    Files.move(part, Paths.get(s"$dst/documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.list(Paths.get(stage)).iterator().asScala.foreach(Files.delete)
    Files.delete(Paths.get(stage))
    val top = spark.read.parquet(s"$dst/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").count().orderBy(desc("count")).limit(3)
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")
    println(s"LMSKEW zipf docs staged (top3 $top)")
  }
}
