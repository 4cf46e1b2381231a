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

  // ONE pass over the registry feeds both lints: building a query's
  // plan executes any streaming replay it contains (the run* harnesses
  // are eager), so the pass leaves behind the physical plans AND the
  // SinkAudit trail of which sink every replay landed in.
  private lazy val plans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] = {
    graft.streaming.StreamOps.SinkAudit.clear()
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.executedPlan
    }
  }

  test("no registered query plans a shuffled cartesian product") {
    val offenders = plans.flatMap { case (name, plan) =>
      val carts = collectWithSubqueries(plan) {
        case c: CartesianProductExec => c
      }
      if (carts.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"shuffled cartesian in: ${offenders.mkString(", ")}")
  }

  test("unpartitioned windows appear only over post-aggregation frames") {
    // A Window with no PARTITION BY funnels every input row through
    // one task — the canonical scale-killer when the input grows with
    // a deployment (the pre-r17 GeoNearest ranked the whole signal
    // layer this way). The legal pattern is the documented
    // post-aggregation one: RankOps' offsets window over <=64 bucket
    // counts, Pack.prefixSum's totals window over bucket sums,
    // SpeedOps.topNGroups over an already-reduced per-group frame —
    // all sit directly above an aggregate, which this lint checks
    // structurally: descending from the window through
    // sort/exchange/projection wrappers must reach an aggregate exec
    // (or a limit-bounded TakeOrderedAndProject — the optimizer's
    // rank<=n pushdown under topNGroups, parallel and bounded at n
    // rows by construction) before any scan, join, or generator.
    // Row-level global ranking belongs in RankOps.withGlobalRank.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def inputOf(p: SparkPlan): SparkPlan = p match {
      case s: SortExec => inputOf(s.child)
      case e: exchange.ShuffleExchangeLike => inputOf(e.child)
      case p: ProjectExec => inputOf(p.child)
      case f: FilterExec => inputOf(f.child)
      case c: CoalesceExec => inputOf(c.child)
      case other => other
    }
    def isBounded(p: SparkPlan): Boolean = p match {
      case _: aggregate.HashAggregateExec => true
      case _: aggregate.ObjectHashAggregateExec => true
      case _: aggregate.SortAggregateExec => true
      case _: TakeOrderedAndProjectExec => true
      case _: GlobalLimitExec => true
      case _ => false
    }
    val offenders = plans.flatMap { case (name, plan) =>
      val bad = collectWithSubqueries(plan) {
        case w: WindowExec if w.partitionSpec.isEmpty && !isBounded(inputOf(w.child)) => w
        case w: WindowGroupLimitExec
          if w.partitionSpec.isEmpty && !isBounded(inputOf(w.child)) => w
      }
      if (bad.nonEmpty) Some(s"$name (${bad.head.getClass.getSimpleName} over ${inputOf(bad.head.children.head).getClass.getSimpleName})")
      else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned window over a non-aggregated frame in: ${offenders.mkString(", ")}")
  }

  test("no registered streaming query lands in the driver memory sink") {
    // Sink discipline: a memory sink collects EVERY output row into the
    // driver per micro-batch — for output that grows with the feed
    // (dedup = the distinct corpus, joins = match density, per-event
    // state transforms) that is the one bottleneck no executor count
    // can fix. Every registered replay must land distributed: parquet
    // (append), parquet+state, update-deltas, dated zone, or the
    // complete-mode snapshot refresh. runToMemory survives for
    // tests/probes only; this lint catches any future registry query
    // wired back onto it (it would have caught st_stream_dedup /
    // st_stream_join, which shipped driver-funneled through round 15).
    plans.length // force the registry pass
    val mem = graft.streaming.StreamOps.SinkAudit.memorySinks
    assert(mem.isEmpty, s"registered queries using the memory sink: $mem")
  }
}
