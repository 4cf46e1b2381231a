package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StructField, StructType}

/** Codegen polygon primitives over a vertex array
  * (array<struct<x:double,y:double>>).
  *
  * The equivalent `aggregate`/`zip_with` Column trees are higher-order
  * functions — CodegenFallback, interpreted per row — and they sit in
  * join conditions where Catalyst may re-evaluate them per candidate
  * pair. These replace them with one compiled loop per row. Arithmetic
  * replicates the HOF trees operation-for-operation (same half-open
  * crossing rule, same left-fold order for the shoelace sum), so the
  * DuckDB oracles that hash-matched the HOF versions keep matching.
  */
case class RayCastContains(verts: Expression, lat: Expression, lon: Expression)
  extends TernaryExpression {
  override def first: Expression = verts
  override def second: Expression = lat
  override def third: Expression = lon
  override def dataType: DataType = BooleanType
  override def prettyName: String = "ray_cast_contains"
  override def checkInputDataTypes() = {
    val ok = verts.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, DoubleType, _, _), StructField(_, DoubleType, _, _))), _) =>
        lat.dataType == DoubleType && lon.dataType == DoubleType
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<struct<x double, y double>>, double, double)")
  }

  override def nullSafeEval(v: Any, la: Any, lo: Any): Any =
    RayCastContains.compute(v.asInstanceOf[ArrayData],
      la.asInstanceOf[Double], lo.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, la, lo) =>
      s"graft.plans.RayCastContains.compute($v, $la, $lo)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression) =
    copy(verts = newFirst, lat = newSecond, lon = newThird)
}

object RayCastContains {
  /** Called from generated code. Even-odd rule, half-open vertex
    * convention — identical to PolyJoin.containsRayCast's HOF tree and
    * the oracle SQL. */
  def compute(verts: ArrayData, lat: Double, lon: Double): Boolean = {
    val n = verts.numElements()
    var crossings = 0
    var i = 0
    while (i < n) {
      // null vertex (ArrayType containsNull permits it): the HOF tree
      // yields null, which in this expression's filter/join-condition
      // position drops the row exactly as false does
      if (verts.isNullAt(i) || verts.isNullAt((i + 1) % n)) return false
      val a = verts.getStruct(i, 2)
      val b = verts.getStruct((i + 1) % n, 2)
      val ax = a.getDouble(0); val ay = a.getDouble(1)
      val bx = b.getDouble(0); val by = b.getDouble(1)
      if ((ay > lat) != (by > lat) &&
        lon < ax + (bx - ax) * (lat - ay) / (by - ay)) crossings += 1
      i += 1
    }
    (crossings & 1) == 1
  }
}

/** Convex CCW containment: every edge cross product non-negative
  * (boundary-inclusive) — the compiled form of PolyJoin.containsConvex's
  * forall/zip_with tree, which was interpreted per candidate pair in
  * the containment join's post-join filter. Identical operand order to
  * the HOF tree and the convex oracle SQL, so hashes are unchanged. */
case class ConvexContains(verts: Expression, lat: Expression, lon: Expression)
  extends TernaryExpression {
  override def first: Expression = verts
  override def second: Expression = lat
  override def third: Expression = lon
  override def dataType: DataType = BooleanType
  override def prettyName: String = "convex_contains"
  override def checkInputDataTypes() = {
    val ok = verts.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, DoubleType, _, _), StructField(_, DoubleType, _, _))), _) =>
        lat.dataType == DoubleType && lon.dataType == DoubleType
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<struct<x double, y double>>, double, double)")
  }

  override def nullSafeEval(v: Any, la: Any, lo: Any): Any =
    ConvexContains.compute(v.asInstanceOf[ArrayData],
      la.asInstanceOf[Double], lo.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, la, lo) =>
      s"graft.plans.ConvexContains.compute($v, $la, $lo)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression) =
    copy(verts = newFirst, lat = newSecond, lon = newThird)
}

object ConvexContains {
  /** Called from generated code. Cross-product sign fold, edge i ->
    * i+1 wrapping — (bx-ax)*(lat-ay) - (by-ay)*(lon-ax) >= 0 for all
    * edges, the exact HOF-tree arithmetic. */
  def compute(verts: ArrayData, lat: Double, lon: Double): Boolean = {
    val n = verts.numElements()
    var i = 0
    while (i < n) {
      // null vertex -> false, mirroring the forall/zip_with tree's null
      // in filter position (see RayCastContains.compute)
      if (verts.isNullAt(i) || verts.isNullAt((i + 1) % n)) return false
      val a = verts.getStruct(i, 2)
      val b = verts.getStruct((i + 1) % n, 2)
      val ax = a.getDouble(0); val ay = a.getDouble(1)
      val bx = b.getDouble(0); val by = b.getDouble(1)
      if (!((bx - ax) * (lat - ay) - (by - ay) * (lon - ax) >= 0)) return false
      i += 1
    }
    true
  }
}

/** abs(shoelace)/2 of the ring, in squared coordinate units. Left-fold
  * accumulation in vertex order — the order the HOF tree and the
  * oracle's ordered list_sum use. */
case class RingArea(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ring_area"
  override def checkInputDataTypes() = {
    val ok = child.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, DoubleType, _, _), StructField(_, DoubleType, _, _))), _) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<x double, y double>>")
  }

  override def nullSafeEval(v: Any): Any =
    RingArea.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.RingArea.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): RingArea =
    copy(child = newChild)
}

object RingArea {
  /** Called from generated code. */
  def compute(verts: ArrayData): Double = {
    val n = verts.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val a = verts.getStruct(i, 2)
      val b = verts.getStruct((i + 1) % n, 2)
      acc += a.getDouble(0) * b.getDouble(1) - b.getDouble(0) * a.getDouble(1)
      i += 1
    }
    math.abs(acc) / 2
  }
}
