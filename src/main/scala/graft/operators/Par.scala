package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared fan-out helper. */
object Par {
  /** Spreads narrow rows across the session's shuffle parallelism
    * before a compute-bound stage (per-row parsing, hashing, pair
    * products) — but ONLY when the scan cannot already feed that many
    * tasks. A single-split source file pins all downstream work on one
    * core, and the round-robin shuffle of narrow rows is far cheaper
    * than the serial scan it prevents; a multi-file/multi-split source
    * (the normal case on a cluster) already parallelizes, and an
    * unconditional repartition there would be a pure extra full shuffle
    * of every input byte — at 100 TB, the dominant cost of the query.
    *
    * The probe plans `df` (no job runs) and reads the scan's partition
    * count; callers apply spread directly over source scans, so the
    * count reflects input splits, not prior exchanges. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
