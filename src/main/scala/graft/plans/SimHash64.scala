package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over an array<string> of features (tokens/shingles):
  * per bit, count features whose xxhash64 has that bit set vs unset;
  * the signature bit is the majority sign (Charikar's scheme). Two
  * near-identical documents differ in few features, so their signatures
  * sit within a small Hamming distance.
  *
  * Custom codegen-capable expression: one static call per row, a single
  * pass over the features (vs 64 higher-order-function passes if
  * expressed with transform/filter Column trees).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def inputTypes = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val Seed = 42L

  def apply(c: Column): Column = call_function("simhash64", c)

  /** Called from generated code. */
  def compute(features: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = features.numElements()
    var i = 0
    while (i < n) {
      val s = features.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
