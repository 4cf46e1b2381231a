package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of BPE pre-tokenizer pieces: exactly
  * `size(regexp_extract_all(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]", 0))`
  * without running java.util.regex or materializing the match array.
  *
  * The alternation admits a one-scan reading: matches are
  * non-overlapping and left-to-right, so a maximal ASCII-letter run
  * counts one piece, each ASCII digit counts one, each remaining
  * non-space code point counts one, and spaces count nothing (they are
  * the only characters no alternative can match). Non-ASCII text falls
  * to the third alternative one CODE POINT at a time — java.util.regex
  * character classes match per code point, so a 4-byte emoji is one
  * piece — which byte-wise means counting non-continuation bytes
  * (`b & 0xC0 != 0x80`). BpePieceCountSpec pins value-identity against
  * the live regex form on an adversarial fixture.
  *
  * This count prices every token-budget column (~0.78 s of
  * tx_token_count's 1.06 s at 10x bench data was this one regex,
  * QualityScoreProbe).
  */
case class BpePieceCount(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_piece_count"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    BpePieceCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpePieceCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpePieceCount =
    copy(child = newChild)
}

object BpePieceCount {
  def apply(c: Column): Column = call_function("bpe_piece_count", c)

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  /** Called from generated code. */
  def compute(s: UTF8String): Int = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0L
    var count = 0
    var inLetterRun = false
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b & 0xC0) != 0x80) { // code point start
        if (isLetter(b)) {
          if (!inLetterRun) { count += 1; inLetterRun = true }
        } else {
          inLetterRun = false
          if (b != ' ') count += 1 // digit or any other code point
        }
      }
      // continuation bytes extend the current (non-letter) code point:
      // the run state was already reset at its start byte
      i += 1
    }
    count
  }
}
