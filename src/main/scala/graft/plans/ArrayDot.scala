package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product over two array<double> columns as a single tight loop.
  *
  * Semantically identical (same left-to-right summation order, so
  * bit-identical results) to
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`, but the higher-order
  * form materializes an intermediate array per row — at millions of
  * candidate pairs that allocation dominates the runtime. This
  * expression stays in whole-stage codegen via one static call and
  * allocates nothing.
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"
  // declared input types: SQL callers passing int arrays get an
  // analysis-time cast instead of getDouble misreading packed ints
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ArrayDot.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  def apply(a: Column, b: Column): Column = call_function("array_dot", a, b)

  /** Called from generated code. Requires equal-length array<double>
    * with no null elements — a silent min-length truncation (or
    * getDouble on a null slot, which returns whatever bits sit there)
    * would turn dimension/data mistakes into plausible-but-wrong
    * numbers instead of errors. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"array_dot: length mismatch ($n vs ${b.numElements()})")
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) {
        throw new IllegalArgumentException(s"array_dot: null element at index $i")
      }
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
