package graft

import org.apache.spark.sql.SparkSession

/** Results must be BIT-IDENTICAL regardless of parallelism: the oracle
  * gate hashes values, so any summation-order or partitioning
  * dependence is a correctness bug. Exercises the queries whose
  * aggregates historically sat closest to rounding boundaries.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val probes = Seq("q1_pricing_summary", "q_decile_stats",
    "ta_route_stats", "ta_hourly_activity", "dd_embedding", "ss_brute_topk",
    // corr is a ratio of partition-order-dependent sums; the 4 dp round
    // must absorb the reassociation ulps at ANY partitioning
    "ta_weather_corr",
    // weighted sums through the salted join: salt changes the add order
    "q_skew_join",
    // rollup re-aggregates the same sums at three grouping levels
    "q_rollup",
    // shoelace float fold + contained-point division, both rounded
    "geo_poly_area",
    // round(sum,2) series + LOCF window over the spine
    "ta_interpolate",
    // integer prefix sum through the bucketed two-phase computation
    "tx_pack_sequences",
    // printf-formatted rounded avgs (speed, map center) in the JSON
    "geo_map_export",
    // the full assembled HTML document: collect_list order is fixed by
    // the array_sort, centers by the rounded avgs — any partitioning
    // dependence shows as a byte diff in one string
    "geo_map_html")

  private def runAll(parts: Int): Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try probes.map { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      name -> df.collect().map(_.toString).toSeq.sorted
    }.toMap
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("query results are identical under 3, 5, and 13 shuffle partitions") {
    val base = runAll(3)
    Seq(5, 13).foreach { p =>
      val got = runAll(p)
      probes.foreach { name =>
        assert(got(name) === base(name),
          s"$name differs between 3 and $p shuffle partitions")
      }
    }
  }
}
