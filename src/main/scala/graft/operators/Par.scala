package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared fan-out helper. */
object Par {
  /** Spreads narrow rows across the session's shuffle parallelism
    * before a compute-bound stage (per-row parsing, hashing, pair
    * products). A single-split source file otherwise pins all that work
    * on one core; the round-robin shuffle of narrow rows is far cheaper
    * than the serial scan it prevents. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
}
