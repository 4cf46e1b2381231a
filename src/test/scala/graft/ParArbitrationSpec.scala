package graft

import graft.operators.Par
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Pins both branches of Par.broadcastIfFewRows: a side under the
  * estimated-row cutoff broadcasts; past it the join is a shuffled
  * merge — never a driver-side build of a fact-sized side, never an
  * unhinted fall-through back to the planner's bytes-based pick.
  */
class ParArbitrationSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def joinExecs(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    (collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j },
     collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j })
  }

  test("small side broadcasts") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_orderpriority")
    val l = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_quantity"))
    val (bhj, smj) = joinExecs(
      l.join(Par.broadcastIfFewRows(o), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n")))
    assert(bhj.nonEmpty && smj.isEmpty,
      s"expected the broadcast branch at 1.5k rows: bhj=${bhj.size} smj=${smj.size}")
  }

  test("proxy arbitration: small proxy broadcasts the join-output side") {
    // the side's own stats are a join product (useless); the proxy is
    // the orders scan, well under the cutoff at sf0.001
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .select("c_custkey", "c_nationkey")
    val side = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    val l = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val (bhj, _) = joinExecs(
      l.join(Par.broadcastIfProxyFewRows(side, o, maxEstRows = 500000L),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_nationkey").agg(round(sum("l_quantity"), 2).as("s")))
    assert(bhj.size >= 2, s"expected the reduced side broadcast: ${bhj.size}")
  }

  test("proxy arbitration: big proxy leaves the side unhinted (no broadcast of it)") {
    // cutoff of 1 estimated row: nothing may broadcast the join-output
    // side, and no merge hint is pinned — the plan stays free for
    // AQE's runtime re-arbitration (q5's documented contract)
    val o = Tables.orders(spark, "/root/testdata/sf0.1")
      .select("o_orderkey", "o_custkey")
    val side = o.groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"))
    val l = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select("l_orderkey", "l_quantity")
    val joined = l.join(Par.broadcastIfProxyFewRows(side, o, maxEstRows = 1L),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("n").agg(round(sum("l_quantity"), 2).as("s"))
    // inspect the pre-execution logical plan for hints: neither
    // BROADCAST nor MERGE may be pinned on the side
    val hints = joined.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"expected no join hints past the cutoff: $hints")
  }

  test("fact-sized side pins the shuffled merge") {
    // sf0.1 lineitem (600k rows, ~25 MB pruned estimate) sits well past
    // Par.broadcastIfFewRows's default estimated-row cutoff (50k) while
    // still "small" in bytes — the exact case where the planner's own
    // pick would broadcast
    val big = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_orderkey"), col("l_quantity"))
    val probe = Tables.orders(spark, "/root/testdata/sf0.1")
      .select("o_orderkey")
    val (bhj, smj) = joinExecs(
      probe.join(Par.broadcastIfFewRows(big),
        col("o_orderkey") === col("l_orderkey"))
        .agg(round(sum("l_quantity"), 2).as("s")))
    assert(smj.nonEmpty, s"expected the merge branch past the cutoff: $bhj")
    assert(bhj.isEmpty, s"fact-sized side was broadcast: $bhj")
  }
}
