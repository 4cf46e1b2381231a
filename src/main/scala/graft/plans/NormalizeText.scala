package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for fingerprinting / exact dedup:
  * lowercase, non-alphanumeric runs to a single space, trim — i.e.
  * `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9]+", " "),
  * " +", " "))`, which is what the DuckDB oracles still spell.
  *
  * The Column-tree form pays TWO java-regex passes over every document;
  * at fingerprinting's natural scale (every byte of a 100 TB corpus
  * flows through exact dedup) that is the dominant cost of the
  * operator. This expression emits the same result in one branchless
  * scan for ASCII input — byte-level lowercase + alnum-run tokenizer
  * writing straight into the output buffer — and falls back to the
  * literal lower→regex→regex→trim chain for non-ASCII input, so the
  * two forms are equal by construction there (the fast path is
  * spec-asserted against the Column tree).
  */
case class NormalizeText(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def apply(c: Column): Column = call_function("normalize_text", c)

  /** Called from generated code. */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // ASCII probe: any high bit -> slow path (multi-byte lowercase
    // rules differ from the byte map below)
    var i = 0L
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0)
        return slow(s)
      i += 1
    }
    val out = new Array[Byte](n.toInt)
    var w = 0
    var pendingSpace = false
    i = 0L
    while (i < n) {
      var b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && w > 0) { out(w) = ' '; w += 1 }
        out(w) = b
        w += 1
        pendingSpace = false
      } else {
        pendingSpace = true // runs collapse; leading/trailing drop (trim)
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, w)
  }

  /** Non-ASCII fallback: the literal chain the Column tree / oracle
    * spells, so equality holds by construction. */
  private def slow(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val replaced = lowered.replaceAll("[^a-z0-9]+", " ").replaceAll(" +", " ")
    UTF8String.fromString(replaced).trim()
  }
}
