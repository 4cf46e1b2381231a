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

  test("upgrade drill: losing the legacy output-ordering conf degrades to sort-only") {
    // GraftSession pins spark.sql.legacy.bucketedTableScan.outputOrdering
    // = true so pre-sorted buckets feed the merge join sort-free. A
    // Spark upgrade may drop the legacy conf — this drill exercises
    // that failure path once: with the conf OFF the planner must still
    // elide the join-side SHUFFLES (bucketing survives; only the sort
    // order knowledge is lost) and produce identical results. If this
    // test ever fails with wrong results or a join-side exchange, the
    // degradation is NOT the documented sort-only one — re-evaluate
    // the bucketJoin contract before shipping on the new Spark.
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders2", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem2", "o_orderkey", 8)
    val conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    def agg() = Bucketing.bucketJoin(spark, "b_orders2", "b_lineitem2", "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    try {
      val withConf = agg().collect().map(_.toString).sorted.toSeq
      spark.conf.set(conf, "false")
      val joined = agg()
      val rows = joined.collect().map(_.toString).sorted.toSeq
      assert(rows === withConf,
        "bucket join results changed when the ordering conf flipped")
      val plan = joined.queryExecution.executedPlan
      val smjs = collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, s"bucket join lost the merge shape without the conf:\n$plan")
      // sort-only degradation: the join MAY re-sort its inputs now...
      val shuffles = collectWithSubqueries(plan) {
        case e: ShuffleExchangeLike => e
      }
      // ...but the join sides must still not shuffle (<=1 exchange:
      // the non-bucket-key groupBy)
      assert(shuffles.size <= 1,
        s"conf loss degraded beyond sort-only — join side shuffles:\n$plan")
    } finally {
      spark.conf.set(conf, "true")
      spark.sql("DROP TABLE IF EXISTS b_orders2")
      spark.sql("DROP TABLE IF EXISTS b_lineitem2")
    }
  }
}
