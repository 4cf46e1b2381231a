package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Registry-wide plan lint: walks EVERY registered query's physical
  * plan at sf0.001 and rejects the one join shape that is always a
  * scale bug — a shuffle-side cartesian product (CartesianProductExec:
  * both sides materialized and cross-paired with no key). The
  * legitimate tiny-side patterns (1-row audit stats, literal bounds,
  * centroid sets, the GeoNearest exactness net) plan as
  * BroadcastNestedLoopJoin and are untouched; anything that degrades
  * to a shuffled cartesian — e.g. a broadcast threshold change or a
  * lost equi-key — fails here before it fails at 100 TB.
  *
  * Doubles as a construction smoke test: every registered query must
  * at least build its plan on a vanilla-shaped session.
  */
class RegistryPlanLintSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans a shuffled cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan
        val carts = collectWithSubqueries(plan) {
          case c: CartesianProductExec => c
        }
        if (carts.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"shuffled cartesian in: ${offenders.mkString(", ")}")
  }
}
