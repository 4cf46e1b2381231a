package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token count: exactly `size(split(trim(text), "\\s+"))`
  * without materializing the token array.
  *
  * Replicated semantics, bit for bit:
  *  - Spark `trim` strips ASCII SPACE (0x20) only;
  *  - java.util.regex `\s` is ASCII `[ \t\n\x0B\f\r]` (no
  *    UNICODE_CHARACTER_CLASS);
  *  - `split(..., -1)` yields (whitespace runs + 1) segments, keeping
  *    empty leading/trailing segments — so the empty string counts 1,
  *    and a trailing tab (which trim does not strip) adds a segment.
  *
  * All of `\s` is single-byte ASCII, so the scan is byte-wise even for
  * multi-byte UTF-8 text (continuation bytes are >= 0x80 and can never
  * alias a whitespace byte). The count feeds every token-rate heuristic
  * (quality scores, language ID, token budgeting) — at corpus scale the
  * split tree's per-document array allocation was pure garbage-collector
  * load for a number the scan can produce directly.
  */
case class WsTokenCount(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_count"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    WsTokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WsTokenCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

object WsTokenCount {
  def apply(c: Column): Column = call_function("ws_token_count", c)

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Called from generated code. */
  def compute(s: UTF8String): Int = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // trim(): ASCII space only, both ends
    var lo = 0L
    while (lo < n && org.apache.spark.unsafe.Platform.getByte(base, off + lo) == ' ') lo += 1
    var hi = n.toLong
    while (hi > lo && org.apache.spark.unsafe.Platform.getByte(base, off + hi - 1) == ' ') hi -= 1
    // segments = whitespace runs + 1 (split with limit -1 keeps empty
    // leading/trailing segments; "" -> 1)
    var runs = 0
    var inRun = false
    var i = lo
    while (i < hi) {
      val ws = isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))
      if (ws && !inRun) runs += 1
      inRun = ws
      i += 1
    }
    runs + 1
  }
}
