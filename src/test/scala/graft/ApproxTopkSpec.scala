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

  test("ag_approx_quantile median stays inside the sketch's error floor") {
    // the spec floor for the self-audit column the driver's rows-only
    // check cannot see: percentile_approx at accuracy=1000 guarantees
    // rank error <= 1/1000; on the events value distribution that
    // bounds the median's relative error well under 2% — a sketch
    // regression (accuracy knob, expression swap) must fail here, the
    // same guard the LSH recall floors give the dedup family
    val out = graft.queries.MiscQueries.agApproxQuantile(spark, sf)
    val errs = out.select("median_rel_err").as[Double].collect()
    assert(errs.nonEmpty, "no groups produced")
    assert(errs.forall(_ <= 0.02),
      s"median rel_err above floor: ${errs.mkString(",")}")
    // p99 must sit between the exact median and the max by construction
    val bad = out.filter(col("approx_p99") < col("exact_median")).count()
    assert(bad === 0L, "approx_p99 below the exact median")
  }
}
