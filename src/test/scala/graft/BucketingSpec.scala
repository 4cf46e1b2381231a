package graft

import graft.sources.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)
    // no conf override: bucketJoin's own MERGE hint must pin the
    // co-located merge against the planner's broadcast preference
    try {
      val joined = Bucketing.bucketJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum > 0)
      val plan = joined.queryExecution.executedPlan
      val smjs = collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, s"hint lost: bucket join is not a merge join:\n$plan")
      // the buckets are written pre-sorted, so the merge join must not
      // re-sort either side
      val sortsUnderJoin = collectWithSubqueries(smjs.head) {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sortsUnderJoin.isEmpty,
        s"bucket sort order not exploited — join re-sorts:\n$plan")
      val shufflesBeforeAgg = collectWithSubqueries(plan) {
        case e: ShuffleExchangeLike => e
      }
      // exactly one exchange is allowed: the groupBy on a NON-bucket
      // key; the join itself must not shuffle either side
      assert(shufflesBeforeAgg.size <= 1,
        s"expected bucket join to elide join shuffles, got:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
