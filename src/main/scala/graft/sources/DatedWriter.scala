package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned landing writer mirroring the reference's
  * date-rotated JSONL output (kpt/poller/writer.py:18-57
  * `build_file_path` / `_should_rotate`: one output file per yyyyMMdd
  * date). In Spark the same contract is a `partitionBy(date_key)`
  * write: each date lands in its own directory, an append goes to the
  * partition its rows' timestamps derive (dynamic partition overwrite
  * untouched dates), and — the property rotation exists to provide —
  * readers PRUNE to the dates they ask for instead of scanning the
  * whole landing zone (asserted in DatedWriterSpec).
  */
object DatedWriter {

  /** Writes `df` partitioned by the yyyyMMdd image of `tsCol`.
    *
    * The shuffle before the write is the point: `partitionBy` alone
    * writes from whatever partitioning the upstream plan has, so every
    * task emits a file for every date it holds — up to |tasks|×|dates|
    * tiny files, the classic landing-zone killer at scale. Clustering
    * by (date_key, salt) first bounds output to at most `filesPerDate`
    * files per date partition while keeping `filesPerDate`-way write
    * parallelism within a hot date (salting by date alone would funnel
    * each date through one task). The salt is derived from row content
    * (deterministic), so shuffle retries re-route rows identically;
    * bit-identical duplicate rows co-locating is fine here — the bound
    * is files-per-date, not bytes-per-file. For byte-exact file sizing
    * layer `spark.sql.files.maxRecordsPerFile` on top. */
  def writeDated(df: DataFrame, tsCol: String, outDir: String,
                 format: String = "parquet", mode: String = "overwrite",
                 filesPerDate: Int = 4): Unit = {
    require(filesPerDate >= 1, s"filesPerDate=$filesPerDate must be >= 1")
    val dated = df.withColumn("date_key", date_format(col(tsCol), "yyyyMMdd"))
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(filesPerDate))
    // EXPLICIT partition count: a bare repartition(cols) lets AQE
    // coalesce the small shuffle to ONE post-shuffle partition
    // (advisory 64 MB >> a replay batch), which turns the write into a
    // single sequential sort-based task opening |dates| parquet
    // writers one after another — measured 0.75 -> 0.52 s at sf0.1.
    // Pinning the session's shuffle parallelism keeps whole
    // (date, salt) groups per task (≤1 file per group either way) with
    // the date dirs written concurrently.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    dated.repartition(parts, col("date_key"), salt)
      .write.partitionBy("date_key").format(format).mode(mode).save(outDir)
  }

  /** Reads a dated landing dir. date_key is normalized back to string:
    * the digits-only directory value would otherwise infer as int, and
    * the partition column must compare like the writer produced it. */
  def readDated(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
      .withColumn("date_key", col("date_key").cast("string"))
}
