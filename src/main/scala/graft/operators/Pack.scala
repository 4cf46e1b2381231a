package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: lay documents end-to-end
  * in a deterministic order and chunk the token stream into fixed-size
  * training sequences ("concat-and-chunk") — each doc is assigned the
  * sequence its FIRST token lands in.
  *
  * The core is a global ordered prefix sum, which a naive window
  * (`Window.orderBy(id)` with no partition) computes on ONE task — the
  * classic scale trap. Here it is two-phase, the same shape as
  * RankOps.exactNtile: (1) bucket rows by id range and prefix-sum
  * WITHIN each bucket (parallel windows); (2) total each bucket and
  * prefix-sum the bucket totals — a `buckets`-row frame, broadcast
  * back as per-bucket offsets. Every row's global offset is
  * bucket-offset + within-bucket prefix; work is one narrow shuffle
  * plus an O(buckets) side computation, independent of corpus size.
  */
object Pack {

  /** Adds `__offset` (exclusive global prefix sum of `tokCol` in
    * `idCol` order) to `docs`. Deterministic for unique ids. */
  def prefixSum(docs: DataFrame, idCol: String, tokCol: String,
                buckets: Int = 64): DataFrame = {
    val mx = docs.agg((max(col(idCol)) + 1).as("__mx"))
    val bucketed = docs.crossJoin(broadcast(mx))
      // id * buckets / (max+1): monotone in id, range-partitions ids
      // into `buckets` contiguous groups without assuming density
      .withColumn("__b", (col(idCol) * buckets / col("__mx")).cast("long"))
      .drop("__mx")
    val inBucket = Window.partitionBy("__b").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = bucketed.withColumn("__local",
      sum(col(tokCol)).over(inBucket) - col(tokCol))
    val totalsW = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy("__b").agg(sum(tokCol).as("__bt"))
      .withColumn("__boff", sum("__bt").over(totalsW) - col("__bt"))
      .select("__b", "__boff")
    withLocal.join(broadcast(offsets), "__b")
      .withColumn("__offset", col("__boff") + col("__local"))
      .drop("__b", "__local", "__boff")
  }

  /** Packs docs into `seqTokens`-sized sequences and returns per-
    * sequence stats: docs whose first token lands in the sequence,
    * their token mass, and the id span — the manifest a sharded
    * tokenizer job consumes. */
  def packSequences(docs: DataFrame, idCol: String, tokCol: String,
                    seqTokens: Long, buckets: Int = 64): DataFrame =
    prefixSum(docs, idCol, tokCol, buckets)
      .withColumn("seq_id", (col("__offset") / seqTokens).cast("long"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokCol).as("n_tokens"),
        min(idCol).as("first_doc"),
        max(idCol).as("last_doc"))
}
