package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Byte-summary statistics of a binary payload in one compiled loop:
  * sum of unsigned byte values and count of bytes > 32 ("inked").
  *
  * Replaces a per-byte `transform(sequence(...), i -> conv(hex(
  * substr(bin, i, 1)), 16, 10))` + `aggregate` fold — higher-order
  * functions are interpreted, and that tree additionally round-trips
  * EVERY BYTE through a hex string; for a decode-stage stub whose whole
  * point is "the plumbing is real even though the codec is fake", the
  * plumbing should cost what a real byte scan costs. Integer sums are
  * arithmetic-order-free, so the swap changes no query hash.
  */
case class ByteStats(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ByteStats.resultType
  override def prettyName: String = "byte_stats"
  override def inputTypes = Seq(BinaryType)

  override def nullSafeEval(input: Any): Any =
    ByteStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ByteStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}

object ByteStats {
  val resultType: DataType = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("k", LongType, nullable = false)))

  def apply(c: Column): Column = call_function("byte_stats", c)

  /** Called from generated code. */
  def compute(bytes: Array[Byte]): InternalRow = {
    var s = 0L
    var k = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      s += b
      if (b > 32) k += 1
      i += 1
    }
    InternalRow(s, k)
  }
}
