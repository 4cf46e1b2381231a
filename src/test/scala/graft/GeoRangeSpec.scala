package graft

import graft.functions.GeoFunctions
import graft.plans.HaversineDist
import org.apache.spark.sql.catalyst.expressions.{LessThanOrEqual, Subtract}
import org.apache.spark.sql.functions._

class GeoRangeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 50.451, 30.521), // ~130 m from center
    (2L, 50.48, 30.52),   // ~3.3 km
    (3L, 50.60, 30.52),   // ~16.7 km
    (4L, 50.45, 31.00))   // ~34 km
    .toDF("id", "lat", "lon")

  private def dist = HaversineDist(col("lat"), col("lon"), lit(50.45), lit(30.52))

  test("HaversineDist matches the Column-tree haversine") {
    val both = points.select(
      dist.as("a"),
      GeoFunctions.haversineKm(col("lat"), col("lon"), lit(50.45), lit(30.52)).as("b"))
      .as[(Double, Double)].collect()
    both.foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("GeoRangeRule injects the latitude-band prefilter into the plan") {
    // parquet-backed input: a LocalRelation would be folded away by the
    // optimizer before the plan could be inspected
    val q = queries.GeoQueries.geoRangeQuery(spark, "/root/testdata/sf0.001")
    val optimized = q.queryExecution.optimizedPlan
    val bands = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case LessThanOrEqual(Subtract(_, _, _), _) => true
        }
    }.flatten
    assert(bands.nonEmpty,
      s"expected a lat-band conjunct in the optimized plan:\n$optimized")
  }

  test("rule keeps results identical and sound at the band boundary") {
    val withRule = points.filter(dist < 5.0).select("id").as[Long].collect().toSet
    assert(withRule === Set(1L, 2L))
    // a point just inside the distance cut but near the lat band edge:
    // 4.4 km due north (pure latitude separation — the bound's worst case)
    val edge = Seq((9L, 50.45 + 4.4 / 111.1949, 30.52)).toDF("id", "lat", "lon")
    assert(edge.filter(dist < 5.0).count() === 1)
  }
}
