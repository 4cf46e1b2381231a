package graft

/** Scale-rehearsal data generator: replicates an sf dir N× into /tmp as
  * N key-shifted INDEPENDENT shards, so heavy-family bench queries can
  * be rehearsed at 10× data (the driver ships no sf1).
  *
  * Independence is the point — naive row duplication would make every
  * document/embedding an exact clone of its replicas, turning the
  * near-dup pair graph quadratic in the replica count instead of
  * scaling the workload linearly. Per replica i:
  *   - all primary/foreign keys shift by i·10^7 (orders/lineitem by
  *     i·10^8) so shards never join across replicas;
  *   - document tokens get an `_ri` suffix (a token bijection: shingle
  *     sets map 1:1, so within-shard Jaccard structure is EXACTLY
  *     preserved while cross-shard shingle overlap is zero);
  *   - embeddings rotate by i dimensions (within-shard cosines exactly
  *     preserved — rotation is orthogonal; cross-shard cosines drop to
  *     the random floor);
  *   - events shift event_id only: users/vehicles densify 10× inside
  *     the same time range, the realistic way a stream grows.
  *
  *   sbt 'Test/runMain graft.GenScale [srcDir] [dstDir] [copies]'
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, copies)
    spark.stop()
  }

  def generate(spark: org.apache.spark.sql.SparkSession,
               src: String, dst: String, copies: Int): Unit = {
    // replicas 0-63 use pure rotation (byte-identical to the original
    // sf1 recipe); 64+ compose the rotation with a hash-seeded ±1
    // sign-flip (also orthogonal, so within-shard cosines stay exactly
    // preserved) — without it replica i and i-64 would share a
    // rotation and every vector would meet an exact cross-shard clone,
    // quadratically corrupting the dedup/ANN families at sf10
    require(copies >= 1 && copies <= 128,
      s"copies=$copies must be in [1, 128] (embedding transform bound)")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Column, DataFrame}
    import scala.jdk.CollectionConverters._

    val M = 10000000L
    val G = 100000000L

    // testdata layout is ONE PLAIN FILE per table (not a Spark output
    // directory) and consumers depend on it — StreamOps.eventsStream
    // symlinks `$dir/events.parquet` as a file into its stream stage, so
    // a directory there yields an EMPTY stream. Write to a scratch dir,
    // then promote the single part file to `$dst/$table.parquet`.
    def replicate(table: String)(tr: (DataFrame, Int) => DataFrame): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val base = spark.read.parquet(s"$src/$table.parquet")
      val out = (0 until copies).map(i => tr(base, i)).reduce(_ union _)
      val stage = s"$dst/_stage_$table"
      // ~2 MB row groups: a 100 TB table arrives as thousands of
      // independently scannable splits; a coalesce(1) shard with one
      // 113 MB row group (the old default) forced every sf1 scan —
      // Spark's AND DuckDB's (it also parallelizes over row groups) —
      // onto a single thread, understating both engines. Sized against
      // GraftSession's matching files.maxPartitionBytes so the split
      // estimate equals real row-group parallelism.
      out.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (2L * 1024 * 1024).toString)
        .parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $table"))
      Files.move(part, Paths.get(s"$dst/$table.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.list(Paths.get(stage)).iterator().asScala.foreach(Files.delete)
      Files.delete(Paths.get(stage))
      println(s"GENSCALE $table x$copies done")
    }
    def shift(c: String, by: Long, i: Int): Column = col(c) + lit(by * i)

    // dims stay fixed: scale grows facts, not the nation list — plain
    // file copy keeps the testdata single-file-per-table layout
    Seq("region", "nation").foreach { t =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      Files.createDirectories(Paths.get(dst))
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$dst/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"GENSCALE $t copied")
    }
    replicate("customer")((df, i) => df.withColumn("c_custkey", shift("c_custkey", M, i)))
    replicate("supplier")((df, i) => df.withColumn("s_suppkey", shift("s_suppkey", M, i)))
    replicate("part")((df, i) => df.withColumn("p_partkey", shift("p_partkey", M, i)))
    replicate("orders")((df, i) => df
      .withColumn("o_orderkey", shift("o_orderkey", G, i))
      .withColumn("o_custkey", shift("o_custkey", M, i)))
    replicate("lineitem")((df, i) => df
      .withColumn("l_orderkey", shift("l_orderkey", G, i))
      .withColumn("l_partkey", shift("l_partkey", M, i))
      .withColumn("l_suppkey", shift("l_suppkey", M, i)))
    replicate("events")((df, i) => df.withColumn("event_id", shift("event_id", G, i)))
    replicate("documents") { (df, i) =>
      val text =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1_r$i")
      df.withColumn("doc_id", shift("doc_id", M, i))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (df, i) =>
      val r = i % 64
      val rot =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, 64 - r),
          slice(col("embedding"), 1, r))
      val emb =
        if (i < 64) rot
        else {
          val m = GenClustered.mix64(i.toLong)
          val flips = lit(Array.tabulate(64)(d =>
            if (((m >>> d) & 1L) == 1L) -1.0f else 1.0f))
          zip_with(rot, flips, (x, f) => x * f)
        }
      df.withColumn("vec_id", shift("vec_id", M, i))
        .withColumn("embedding", emb)
    }
  }
}
