package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Spherical haversine distance (km) as a first-class Catalyst
  * expression. Same math (and [0,1] clamp) as
  * GeoFunctions.haversineKm's Column tree, but as a NODE the optimizer
  * can pattern-match — [[GeoRangeRule]] rewrites range filters over
  * this expression into bbox-prefiltered form, which a Column-tree
  * encoding could not support. Codegen: one static call.
  */
case class HaversineDist(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
  extends QuaternaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_km"
  // integer SQL literals widen at analysis instead of CCE in eval
  override def inputTypes =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)

  override def nullSafeEval(lat1: Any, lon1: Any, lat2: Any, lon2: Any): Any =
    HaversineDist.compute(lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.plans.HaversineDist.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineDist =
    copy(newFirst, newSecond, newThird, newFourth)
}

object HaversineDist {
  val EarthRadiusKm = 6371.0
  /** Conservative km per degree of latitude (true value 111.1949…;
    * using the smaller constant WIDENS the bbox, keeping it sound). */
  val KmPerLatDeg = 111.0

  def apply(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    call_function("haversine_km", lat1, lon1, lat2, lon2)

  /** Called from generated code. Mirrors GeoFunctions.haversineKm
    * including the [0,1] clamp on `a`. */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dlat = math.toRadians(lat2 - lat1)
    val dlon = math.toRadians(lon2 - lon1)
    val sa = math.sin(dlat / 2)
    val sb = math.sin(dlon / 2)
    val a = sa * sa + math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * sb * sb
    2 * EarthRadiusKm * math.atan2(
      math.sqrt(math.min(a, 1.0)), math.sqrt(math.max(1.0 - a, 0.0)))
  }
}
