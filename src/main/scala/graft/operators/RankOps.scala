package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking without a single-partition sort.
  *
  * `Window.orderBy` with no partition key funnels EVERY row through one
  * task — the canonical scale-killer for row-level data. This operator
  * computes the same exact global rank / ntile in parallel:
  *
  *  1. coarse range-bucket rows on the sort column (boundaries from
  *     percentile_approx, carried in-plan via a broadcast cross join —
  *     no driver-side collect);
  *  2. per-bucket row_number — a window PARTITIONED by bucket, so the
  *     sort parallelizes across buckets;
  *  3. bucket counts → cumulative offsets (a window over only B rows);
  *  4. global rank = bucket offset + in-bucket rank; ntile from the
  *     rank by the exact SQL ntile formula.
  *
  * Bucket-boundary ties are safe: bucket = #(boundaries < value) sends
  * every row with an equal sort value to the same bucket, and buckets
  * are monotone in the sort value, so cross-bucket order is total.
  * Boundary skew only affects balance, never correctness.
  */
object RankOps {

  val DefaultBuckets = 64

  /** Adds `__grank` (1-based exact global rank by (sortCol, tieCol))
    * AND `__total` (the constant row count, riding the same broadcast
    * offsets row — [[exactNtile]] consumes it and drops it; any other
    * caller should `.drop("__total")` if the extra column matters).
    *
    * Buckets are UNIFORM-WIDTH between the exact min and max — not
    * approx quantiles — because the bucketed frame is evaluated by TWO
    * plan branches (counts/offsets and ranks) and the boundaries must
    * come out identical in both: min/max are exact and
    * merge-order-insensitive, while a percentile_approx sketch can
    * merge differently per evaluation on a cluster and silently
    * mis-align offsets against ranks. Value skew only unbalances bucket
    * SIZES (a perf concern AQE absorbs), never correctness. */
  def withGlobalRank(df: DataFrame, sortCol: String, tieCol: String,
                     buckets: Int = DefaultBuckets): DataFrame = {
    // nan-free bounds: min/max skip nulls, so masking NaN to null
    // keeps the finite spread even when NaN rows exist
    val nonNan = when(isnan(col(sortCol).cast("double")), lit(null))
      .otherwise(col(sortCol))
    val bounds = df.agg(min(nonNan).cast("double").as("__lo"),
      max(nonNan).cast("double").as("__hi"))
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__w", (col("__hi") - col("__lo")) / buckets)
      // null sort values get their own lowest bucket (-1): ASC ordering
      // in Spark SQL is NULLS FIRST, and the floor arithmetic would
      // otherwise yield a null bucket that silently drops the row at
      // the offsets join. The null test must come first — with an
      // all-null column the min/max bounds are null too.
      // NaN guard: one NaN sort value poisons __hi (max returns NaN —
      // Spark orders NaN greatest) and floor(NaN) is bucket 0, silently
      // collapsing EVERY row into one bucket — the unpartitioned-sort
      // scale-killer this operator exists to avoid (r18 review). NaN
      // rows get the LAST bucket (they sort greatest) and the bounds
      // exclude them, so finite rows keep their spread.
      .withColumn("__bucket",
        when(col(sortCol).isNull, lit(-1)).otherwise(
          when(isnan(col(sortCol).cast("double")), lit(buckets - 1)).otherwise(
            when(col("__w") <= 0 || isnan(col("__w")), lit(0)).otherwise(
              least(greatest(
                floor((col(sortCol) - col("__lo")) / col("__w")).cast("int"),
                lit(0)), lit(buckets - 1))))))
      .drop("__lo", "__hi", "__w")
    // The bucketed frame feeds two branches. They deliberately do NOT
    // share a checkpoint or exchange: the counts branch map-side
    // partial-aggregates to ≤`buckets` rows per input split before its
    // shuffle and column-prunes to the sort column alone, so its
    // re-evaluation is a narrow columnar scan + a ~64-row exchange —
    // cheaper at any scale than pinning the full-width frame in
    // executor memory (the previous lazy localCheckpoint, which also
    // paid a full physical-planning pass at DataFrame BUILD time —
    // ~0.3 s of fixed floor — because Dataset.localCheckpoint
    // materializes an RDD of the subtree even when lazy). Evaluating
    // the bucket expression twice is safe by construction: exact
    // min/max bounds are merge-order-insensitive, so both branches
    // compute identical bucket ids (the comment on the declaration).
    val inBucketW = Window.partitionBy("__bucket")
      .orderBy(col(sortCol).asc, col(tieCol).asc)
    val counts = bucketed.groupBy("__bucket").agg(count(lit(1)).as("__bn"))
    // B rows: the unpartitioned window here is over the BUCKET COUNTS,
    // not the data — bounded by `buckets`, never by |df|.
    val offW = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum("__bn").over(offW), lit(0L)))
      .withColumn("__total", sum("__bn").over(
        Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__bucket", "__off", "__total")
    bucketed
      .withColumn("__rn", row_number().over(inBucketW).cast("long"))
      .join(broadcast(offsets), "__bucket")
      .withColumn("__grank", col("__off") + col("__rn"))
      .drop("__bucket", "__rn", "__off")
  }

  /** Exact SQL-ntile bucket from a 1-based global rank `r` of `total`
    * rows: the first (total % n) tiles hold one extra row. Column `/`
    * is double division; floor(a/b) equals integer division exactly
    * while operands stay below 2^52 (quotient ulp < spacing 1/b) —
    * i.e. for any realistic row count. */
  def ntileFromRank(r: Column, total: Column, n: Int): Column = {
    val q = floor(total / n).cast("long")
    val rem = (total % n).cast("long")
    val cut = rem * (q + 1)
    when(r <= cut, floor((r - 1) / (q + 1)).cast("long") + 1)
      .otherwise(rem + floor((r - cut - 1) / q).cast("long") + 1)
  }

  /** Exact distributed ntile: same result as
    * `ntile(n) OVER (ORDER BY sortCol, tieCol)` with no global-sort
    * bottleneck. Adds column `tileName`. */
  def exactNtile(df: DataFrame, sortCol: String, tieCol: String,
                 n: Int, tileName: String,
                 buckets: Int = DefaultBuckets): DataFrame =
    withGlobalRank(df, sortCol, tieCol, buckets)
      .withColumn(tileName, ntileFromRank(col("__grank"), col("__total"), n))
      .drop("__grank", "__total")
}
