package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a `haversine_km(lat1, lon1, lat2, lon2) < r` filter
  * implies `|lat1 - lat2| <= r / 111 km`, because great-circle distance
  * is bounded below by the pure latitude separation. The rule conjoins
  * that trig-free latitude-band predicate, which (for a literal
  * reference point) is SARGABLE — it reaches the parquet scan as a
  * min/max range filter and prunes row groups before any trigonometry
  * runs. Sound: the band predicate is implied by the distance
  * predicate, so no qualifying row is dropped.
  *
  * Idempotent by construction (fixed-point safe): the conjunct is only
  * added when no semantically-equal conjunct is already present.
  */
object GeoRangeRule extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** The latitude-band conjuncts implied by dist(h) <= r, kept as
    * SEPARATE predicates: the optimizer splits And trees between rule
    * invocations, so idempotence must be checked piecewise. */
  private def latBand(h: HaversineDist, r: Double): Seq[Expression] = {
    val d = r / HaversineDist.KmPerLatDeg
    val dlat = Subtract(h.first, h.third)
    Seq(LessThanOrEqual(dlat, Literal(d, DoubleType)),
      GreaterThanOrEqual(dlat, Literal(-d, DoubleType)))
  }

  private def implied(cond: Expression): Seq[(HaversineDist, Double)] =
    splitConjuncts(cond).collect {
      case LessThan(h: HaversineDist, Literal(r: Double, DoubleType)) => (h, r)
      case LessThanOrEqual(h: HaversineDist, Literal(r: Double, DoubleType)) => (h, r)
      case GreaterThan(Literal(r: Double, DoubleType), h: HaversineDist) => (h, r)
      case GreaterThanOrEqual(Literal(r: Double, DoubleType), h: HaversineDist) => (h, r)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjuncts(cond)
      val toAdd = implied(cond)
        .flatMap { case (h, r) => latBand(h, r) }
        .filterNot(p => existing.exists(_.semanticEquals(p)))
      if (toAdd.isEmpty) f
      else Filter(toAdd.foldLeft(cond)(And(_, _)), child)
  }
}
