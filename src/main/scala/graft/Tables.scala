package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables.
  *
  * Plain `spark.read.parquet` so Catalyst's parquet source handles column
  * pruning + predicate pushdown; never cache here (callers decide).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Canonical engine representation of `events.ts`: epoch NANOSECOND
    * Long. The driver's parquet has shipped it two ways across rounds —
    * INT64 TIMESTAMP(NANOS) (read as Long under nanosAsLong) and plain
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) — and GenScale's 10x
    * copies write raw BIGINT nanos. Normalizing AT THE LOADER keeps
    * every downstream plan and every DuckDB oracle (which computes
    * `epoch_us(ts)` — exact under both source types) byte-identical
    * regardless of which vintage the input dir carries. The µs→ns
    * widening is a *1000 column op the scan prunes like any other; no
    * precision exists below µs in either source, so nothing is invented.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        // session TZ is pinned UTC (GraftSession), so the NTZ→TIMESTAMP
        // cast reinterprets the same micros value rather than shifting it
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df // already Long nanos
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
