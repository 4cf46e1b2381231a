package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table writer/reader: co-locates both sides of a recurring
  * equi-join at WRITE time so every subsequent join on the bucket key
  * runs shuffle-free (sort-merge over pre-sorted buckets).
  *
  * This is the 100 TB answer for fact-to-fact joins that repeat
  * (orders-lineitem, positions-sessions): pay one shuffle when the data
  * lands, never again. BucketingSpec asserts the joined physical plan
  * contains no shuffle Exchange.
  */
object Bucketing {

  /** Writes df as a bucketed, per-bucket-sorted managed table.
    * Idempotent across JVMs: an in-memory catalog forgets the table on
    * restart but its warehouse directory persists, and CTAS refuses an
    * existing location — so both the catalog entry AND any orphaned
    * directory are cleared first.
    *
    * `reuse = true` (default) returns immediately when THIS JVM's
    * catalog already has the table: bucketing is a one-time layout
    * investment — the whole point is paying the shuffle+sort once and
    * joining shuffle-free forever after — so repeated calls (bench
    * rounds, repeated queries) must not re-stage it. Callers key the
    * table name by source dir, which is immutable here; pass
    * `reuse = false` when the source may have changed. A fresh JVM
    * always rebuilds (the in-memory catalog starts empty). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, reuse: Boolean = true): Unit = {
    val s = df.sparkSession
    if (reuse && s.catalog.tableExists(table)) return
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath, table.toLowerCase)
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    // One file per bucket: a multi-file bucket makes the reader drop
    // the sortBy guarantee (order across a bucket's files is unknown)
    // and the downstream merge join re-sorts both sides — the exact
    // cost the layout exists to pre-pay. repartition on the bucket
    // column uses the same murmur3 hash as the bucket id, so write
    // task i holds exactly bucket i and sortBy yields one sorted file.
    df.repartition(numBuckets, df.col(bucketCol))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(s: SparkSession, table: String): DataFrame = s.table(table)

  /** Joins two tables bucketed on the same key with the same bucket
    * count — planner elides both exchanges AND both sorts (the buckets
    * are written pre-sorted), leaving a pure zipped streaming merge.
    *
    * The MERGE hint pins that shape: without it the planner broadcasts
    * whichever side's pruned estimate slips under the auto-broadcast
    * threshold, and a measured sf1 A/B (BucketAbProbe) has the hinted
    * co-located merge at 0.52 s vs 1.23 s for the broadcast plan — the
    * driver-side hash build of a 1.5M-row "small" side costs more than
    * the merge it displaces, and at real fact-to-fact scale the
    * broadcast is impossible anyway. This is the one join in the
    * engine where the physical strategy is pinned by construction: the
    * whole point of paying the bucketed layout is this exact plan. */
  def bucketJoin(s: SparkSession, leftTable: String, rightTable: String,
                 key: String): DataFrame =
    read(s, leftTable).hint("merge").join(read(s, rightTable), key)
}
