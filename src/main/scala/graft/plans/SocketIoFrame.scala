package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass parser for the reference's Socket.IO event frame
  * `42["<event>",<payload>]` (kpt/poller/parsers.py:56-72 — the
  * message-prefix slice and event/payload split its regexes perform,
  * with arbitrary trailing whitespace tolerated).
  *
  * Semantics are EXACTLY the Java regex `^42\["(\w+)",(.*)\]\s*$` the
  * queries previously evaluated twice per row (once per capture group):
  *   - `\w+` is the ASCII word class (no UNICODE_CHARACTER_CLASS);
  *   - `(.*)` is greedy and excludes line terminators (\n \r U+0085
  *     U+2028 U+2029 — Java `.` with UNIX_LINES off), so the payload
  *     runs to the LAST `]` followed only by whitespace and a frame
  *     whose payload spans lines does NOT match;
  *   - `\s*` is Java's [ \t\n\x0B\f\r].
  * SocketIoFrameSpec pins the expression against the live regex pair
  * on an adversarial fixture, so the claim is asserted, not argued.
  *
  * A non-matching frame yields a NULL struct — the corrupt-routing
  * contract (parse failure is data): callers coalesce the name to ''
  * (what regexp_extract returns on no-match) and any payload probe of
  * NULL is null. One char scan replaces two full regex evaluations
  * (each with backtracking over the payload), which matters because
  * this expression sits on the per-frame hot path of a wire ingest.
  */
case class SocketIoFrame(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = SocketIoFrame.Schema
  override def prettyName: String = "socketio_frame"
  override def inputTypes = Seq(StringType)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SocketIoFrame.compute(input.asInstanceOf[UTF8String])

  // NOT defineCodeGen: compute() returns null for a NON-null input (a
  // frame that fails the match), and defineCodeGen's generated code
  // only derives isNull from the child — a downstream GetStructField
  // would call isNullAt on the null row and NPE. The explicit isNull
  // re-check is the standard pattern for null-producing expressions.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.SocketIoFrame.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): SocketIoFrame =
    copy(child = newChild)
}

object SocketIoFrame {
  val Schema: StructType = StructType(Seq(
    StructField("evt_name", StringType),
    StructField("payload", StringType)))

  def apply(c: Column): Column = call_function("socketio_frame", c)

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == 133.toChar || c == 8232.toChar || c == 8233.toChar

  /** Called from generated code. Null = frame does not match. */
  def compute(frame: UTF8String): InternalRow = {
    val s = frame.toString
    val n = s.length
    if (n < 7 || s.charAt(0) != '4' || s.charAt(1) != '2' ||
        s.charAt(2) != '[' || s.charAt(3) != '"') return null
    var i = 4
    while (i < n && isWord(s.charAt(i))) i += 1
    if (i == 4) return null // \w+ requires at least one word char
    if (i + 1 >= n || s.charAt(i) != '"' || s.charAt(i + 1) != ',') return null
    val nameEnd = i
    val payloadStart = i + 2
    // greedy (.*)\]\s*$: the payload ends at the LAST ']' followed only
    // by whitespace. Java's default-mode `$` additionally matches just
    // BEFORE one final line terminator (\n, \r\n, \r, U+0085, U+2028,
    // U+2029 — caught by the spec fixture: "...]" matches the
    // regex), so strip at most one final terminator first, then the
    // \s* run, then require the ']'.
    var j = n - 1
    if (j >= 0) {
      val c = s.charAt(j)
      if (c == '\n') { j -= 1; if (j >= 0 && s.charAt(j) == '\r') j -= 1 }
      else if (c == '\r' || c == 133.toChar || c == 8232.toChar ||
        c == 8233.toChar) j -= 1
    }
    while (j >= payloadStart && isSpace(s.charAt(j))) j -= 1
    if (j < payloadStart || s.charAt(j) != ']') return null
    var k = payloadStart
    while (k < j) {
      if (isLineTerm(s.charAt(k))) return null // '.' never crosses lines
      k += 1
    }
    val r = new GenericInternalRow(2)
    r.update(0, UTF8String.fromString(s.substring(4, nameEnd)))
    r.update(1, UTF8String.fromString(s.substring(payloadStart, j)))
    r
  }
}
