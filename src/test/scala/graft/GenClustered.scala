package graft

/** Clustered-embeddings realism variant (round-19 verdict item 4): the
  * shipped recall numbers all stand on the driver's ISOTROPIC synthetic
  * embeddings, where true top-10 cosines sit barely above the 64-dim
  * noise floor and hyperplane LSH must buy recall with a ~0.73
  * candidate fraction (SURVEY §14). Real embedding corpora are
  * clustered — near-duplicates and topical neighbors form tight cones —
  * and an index's whole value is pruning hard there. This generator
  * rewrites `embeddings.parquet` as a deterministic mixture of
  * Gaussians (every other table is a plain file copy, so the dir is a
  * drop-in Verify/bench input):
  *
  *   - `clusters` centers, each a seeded unit Gaussian direction;
  *   - vector i belongs to center floorMod(mix64(i), clusters) — an
  *     avalanche hash, NOT i % C, so the % 50 query-set stride never
  *     aliases the cluster assignment;
  *   - v_i = center + sigma·g_i with per-coordinate noise from a
  *     Random seeded by (vec_id, dim) — fully reproducible, no global
  *     RNG sequence to keep in order;
  *   - sigma = 0.072 puts same-cluster cosines around 0.6-0.85 (E[cos]
  *     ≈ 1/(1+64·sigma²) ≈ 0.75) and cross-cluster pairs at the noise
  *     floor — the regime where a tuned index prunes hard.
  *
  *   sbt 'Test/runMain graft.GenClustered [srcDir] [dstDir] [clusters]'
  */
object GenClustered {

  /** splitmix64 finalizer — deterministic avalanche for id→cluster. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val Dim = 64

  def centers(clusters: Int): Array[Array[Double]] =
    Array.tabulate(clusters) { c =>
      val rng = new java.util.Random(0xC0FFEEL + c * 7919L)
      val v = Array.fill(Dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }

  /** The deterministic clustered vector for `vecId`. */
  def vec(vecId: Long, cents: Array[Array[Double]],
          sigma: Double): Array[Float] = {
    val c = cents(java.lang.Math.floorMod(mix64(vecId), cents.length.toLong).toInt)
    val rng = new java.util.Random(mix64(vecId * 131L + 17L))
    Array.tabulate(Dim)(d => (c(d) + sigma * rng.nextGaussian()).toFloat)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft-clustered")
    val clusters = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, clusters)
    spark.stop()
  }

  def generate(spark: org.apache.spark.sql.SparkSession, src: String,
               dst: String, clusters: Int, sigma: Double = 0.072): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    Files.createDirectories(Paths.get(dst))
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents").foreach { t =>
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$dst/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val cents = centers(clusters)
    val ids = spark.read.parquet(s"$src/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    // driver-built rows: the audit corpus tops out at sf1 (50k × 64
    // floats ≈ 13 MB) — generation cost is irrelevant, determinism and
    // the single-plain-file testdata layout are the contract
    import spark.implicits._
    val rows = ids.map(i => (i, vec(i, cents, sigma),
      java.lang.Math.floorMod(mix64(i), clusters.toLong).toInt))
    val out = spark.createDataFrame(rows.toSeq)
      .toDF("vec_id", "embedding", "label")
    val stage = s"$dst/_stage_embeddings"
    out.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (2L * 1024 * 1024).toString)
      .parquet(stage)
    val part = Files.list(Paths.get(stage)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written for embeddings"))
    Files.move(part, Paths.get(s"$dst/embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.list(Paths.get(stage)).iterator().asScala.foreach(Files.delete)
    Files.delete(Paths.get(stage))
    println(s"GENCLUSTERED embeddings clusters=$clusters sigma=$sigma " +
      s"n=${ids.length} done -> $dst")
  }
}
