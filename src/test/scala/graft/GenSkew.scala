package graft

/** Skew-rehearsal variant of a GenScale dir: events.user_id remapped to
  * a zipf(s) distribution over the SAME user set — hot vehicles/routes,
  * the shape a real position stream has (a handful of busy circulator
  * routes dominate the feed) and the one uniform shards cannot
  * rehearse. Every other column and table rides through unchanged, so
  * any per-key window/session/state query runs on both dirs and the
  * uniform-vs-zipf delta isolates SKEW, not volume.
  *
  * Deterministic: the new user is picked by inverse-CDF lookup on
  * xxhash64(event_id) — no RNG, same assignment every run. With s=1.2
  * over 150 users the top key carries ~11% of the stream and the top 5
  * ~32% (vs 0.67% uniform): a 16x hot-partition factor against the
  * mean, comfortably past AQE's skew thresholds.
  *
  *   sbt 'Test/runMain graft.GenSkew [srcDir] [dstDir] [s]'
  */
object GenSkew {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft-sf1")
    val dst = args.lift(1).getOrElse("/tmp/graft-sf1-zipf")
    val s = args.lift(2).map(_.toDouble).getOrElse(1.2)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, s)
    spark.stop()
  }

  def generate(spark: org.apache.spark.sql.SparkSession,
               src: String, dst: String, zipfS: Double): Unit = {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(dst))
    // the non-events tables are identical — plain file copies keep the
    // single-file-per-table layout every consumer expects
    graft.Tables.names.filterNot(_ == "events").foreach { t =>
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$dst/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val ev = spark.read.parquet(s"$src/events.parquet")
    // rank the existing users (ascending id — deterministic), weight
    // rank r by 1/r^s, and build a 65536-bucket inverse-CDF lookup
    val users = ev.select("user_id").distinct()
      .orderBy("user_id").collect().map(_.getLong(0))
    val w = users.indices.map(r => 1.0 / math.pow(r + 1.0, zipfS))
    val totalW = w.sum
    val cdf = w.scanLeft(0.0)(_ + _).drop(1).map(_ / totalW)
    val buckets = 65536
    val lookup = (0 until buckets).map { b =>
      val u = (b + 0.5) / buckets
      val idx = cdf.indexWhere(u <= _) match { case -1 => users.length - 1; case i => i }
      (b.toLong, users(idx))
    }
    import spark.implicits._
    val lut = lookup.toDF("__b", "__skew_user")
    val out = ev
      .withColumn("__b", pmod(xxhash64(col("event_id")), lit(buckets.toLong)))
      .join(broadcast(lut), "__b")
      .drop("__b", "user_id")
      .withColumnRenamed("__skew_user", "user_id")
      .select(ev.columns.map(col): _*)
    val stage = s"$dst/_stage_events"
    out.coalesce(1).write.mode("overwrite").parquet(stage)
    import scala.jdk.CollectionConverters._
    val part = Files.list(Paths.get(stage)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written for events"))
    Files.move(part, Paths.get(s"$dst/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.list(Paths.get(stage)).iterator().asScala.foreach(Files.delete)
    Files.delete(Paths.get(stage))
    val top = spark.read.parquet(s"$dst/events.parquet")
      .groupBy("user_id").count().orderBy(desc("count")).limit(5)
      .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"GENSKEW events done (top5 $top)")
  }
}
