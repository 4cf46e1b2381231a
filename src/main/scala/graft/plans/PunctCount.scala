package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of code points outside `[A-Za-z0-9 ]` — exactly
  * `size(regexp_extract_all(text, "[^A-Za-z0-9 ]", 0))` without
  * materializing one single-character UTF8String per match.
  *
  * The regex form was the whole cost of the quality-score pass: a
  * ~1 KB document yields hundreds of matches, each a fresh object the
  * collector must trace, for a number that is a counter. Measured at
  * 10x bench data the punct_ratio column alone ran 2.44 s of the
  * query's 2.37 s total (QualityScoreProbe); this scan prices it like
  * the other counters (~0.2 s).
  *
  * Semantics: java.util.regex character classes match per CODE POINT
  * (a supplementary character is ONE `[^...]` match), so the scan
  * counts non-continuation bytes (`b & 0xC0 != 0x80`) whose code point
  * is not an ASCII alphanumeric or space. Any multi-byte start byte
  * counts — a non-ASCII code point can never be in `[A-Za-z0-9 ]`.
  * DuckDB's RE2 agrees on this class (byte-class over ASCII, per-rune
  * otherwise), which the oracle relies on.
  */
case class PunctCount(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "punct_count"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    PunctCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PunctCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

object PunctCount {
  def apply(c: Column): Column = call_function("punct_count", c)

  private def isAlnumSpace(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == ' '

  /** Called from generated code. */
  def compute(s: UTF8String): Int = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0L
    var count = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      // skip UTF-8 continuation bytes; count each code point start
      // whose code point falls outside [A-Za-z0-9 ]
      if ((b & 0xC0) != 0x80 && !isAlnumSpace(b)) count += 1
      i += 1
    }
    count
  }
}
