package graft

import org.apache.spark.sql.functions._

class ApproxTopkSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ag_approx_topk counts are exact while cardinality fits the sketch") {
    // user cardinality (~150) is far under approx_top_k's default
    // 10000 tracked items, so every reported count must be exact
    val out = graft.queries.MiscQueries.agApproxTopk(spark, sf)
    val bad = out.filter(col("n_err") =!= 0L).count()
    assert(bad === 0L, "approx_top_k drifted from exact counts under budget")
  }

  test("ag_approx_topk returns k items per group, all genuinely frequent") {
    val out = graft.queries.MiscQueries.agApproxTopk(spark, sf)
    val perGroup = out.groupBy("event_type").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(perGroup.nonEmpty && perGroup.forall(_ === 10L))
    // every reported item exists in the exact counts (left join hit)
    assert(out.filter(col("exact_n").isNull).count() === 0L)
  }
}
