package graft

import org.apache.spark.sql.functions._

/** State-store crossover (round-19 verdict item 8): the RocksDB knob
  * (SPARK_GRAFT_STATE_PROVIDER) has lost every A/B at harness state
  * sizes (SCALE.md r15/r17 — the HDFS-backed heap store wins while
  * state fits comfortably in executor heap). This probe builds the
  * state size the knob exists FOR: a streaming dropDuplicates over N
  * distinct keys drained from an 8-file backlog, so the store carries
  * N entries by the last batch. Run it with SPARK_DRIVER_MEM=4g and
  * the heap store's ~200 B/key puts 12M keys at ~2.5 GB — real GC
  * pressure inside a 4 GB heap — while RocksDB keeps state off-heap.
  * Provider alternates first per round so host drift lands on both.
  *
  *   SPARK_DRIVER_MEM=4g sbt 'Test/runMain graft.StateCrossoverProbe [rounds]'
  *
  * Output: per (N, provider) minima — the crossover N is where rocksdb
  * first reads faster. The DEFAULT stays the heap store (bench-size
  * state); this curve documents where a deployment should flip the
  * knob.
  */
object StateCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(2)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val heap = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"XSTATE heap=${heap}MB")
    val root = graft.streaming.StreamOps.scratchPath("statex")
    for (n <- Seq(1000000L, 4000000L, 12000000L)) {
      val src = s"$root/src-$n"
      spark.range(n)
        .select(col("id").as("k"), (col("id") * 7).as("v"))
        .repartitionByRange(8, col("k"))
        .write.mode("overwrite").parquet(src)
      def drain(): Unit = {
        val ss = spark
        graft.streaming.StreamOps.runCompleteSnapshot(ss, s2 => {
          s2.readStream
            .schema("k LONG, v LONG")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .dropDuplicates("k")
            .agg(count(lit(1)).as("n_keys"), sum("v").as("sv"))
        }, s"statex-$n")
          .write.format("noop").mode("overwrite").save()
      }
      val best = scala.collection.mutable.Map[String, Double]()
      for (r <- 1 to rounds; prov <- {
        val ps = Seq("default" -> None, "rocksdb" -> Some("rocksdb"))
        if (r % 2 == 0) ps.reverse else ps
      }) {
        val (tag, p) = prov
        val t0 = System.nanoTime()
        graft.streaming.StreamOps.ProviderOverride.withValue(p)(drain())
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"XSTATE n=$n $tag r$r $dt%7.3f s")
        best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), dt)
      }
      println(f"XSTATE n=$n MIN default ${best("default")}%7.3f s " +
        f"rocksdb ${best("rocksdb")}%7.3f s " +
        f"ratio ${best("rocksdb") / best("default")}%5.2f")
    }
    spark.stop()
  }
}
