package graft

import graft.plans.{ArrayDot, BinaryGpsDecode, GeoRangeRule, HaversineDist, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's custom Catalyst expressions,
  * wired via `spark.sql.extensions=graft.GraftExtensions` (set by
  * GraftSession.builder). Extension-injected functions resolve in SQL
  * text and through `functions.call_function` alike.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("binary_gps_decode"),
      new ExpressionInfo(classOf[BinaryGpsDecode].getName, "binary_gps_decode"),
      (exprs: Seq[Expression]) => BinaryGpsDecode(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("haversine_km"),
      new ExpressionInfo(classOf[HaversineDist].getName, "haversine_km"),
      (exprs: Seq[Expression]) =>
        HaversineDist(exprs(0), exprs(1), exprs(2), exprs(3))))
    // geo range filters gain a sargable latitude-band prefilter
    ext.injectOptimizerRule(_ => GeoRangeRule)
  }
}
