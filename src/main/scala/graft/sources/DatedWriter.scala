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

  /** Writes `df` partitioned by the yyyyMMdd image of `tsCol`. */
  def writeDated(df: DataFrame, tsCol: String, outDir: String,
                 format: String = "parquet", mode: String = "overwrite"): Unit =
    df.withColumn("date_key", date_format(col(tsCol), "yyyyMMdd"))
      .write.partitionBy("date_key").format(format).mode(mode).save(outDir)

  /** Reads a dated landing dir. date_key is normalized back to string:
    * the digits-only directory value would otherwise infer as int, and
    * the partition column must compare like the writer produced it. */
  def readDated(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
      .withColumn("date_key", col("date_key").cast("string"))
}
