package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocab-driven BPE-style token count as a single-pass codegen
  * expression — the real token-budget estimator a training pipeline
  * runs over every document (the regex pre-tokenizer alone, `n_pieces`,
  * systematically undercounts rare words that fragment into many
  * subwords).
  *
  * Tokenization contract (replicated exactly by the DuckDB oracle in
  * TextQueries.txBpeTokensSql):
  *  1. split the raw text into pieces with
  *     [[graft.functions.TextFunctions.BpeRegex]] (letter runs, single
  *     digits, single punctuation — Java∩RE2 regex, shared with the
  *     oracle);
  *  2. a non-letter piece is exactly one token;
  *  3. a letter run is lowercased and consumed left-to-right by GREEDY
  *     LONGEST MATCH against the vocabulary: at each position take the
  *     longest vocab entry prefixing the remainder (one token), else
  *     emit the single character as an unknown token.
  *
  * Greedy longest-match is deterministic and local — no merge-rank
  * table — so the same literal vocab drives both engines. Cost per word
  * is O(len · maxVocabLen) hash probes in one compiled loop; the whole
  * expression stays inside whole-stage codegen (the tokenizer rides
  * along as a codegen reference object), so it scales with the scan
  * like every other text signal.
  */
case class BpeTokenCount(child: Expression, vocab: Seq[String])
  extends UnaryExpression with ImplicitCastInputTypes {
  require(vocab.nonEmpty, "BPE vocab must not be empty")
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  override def inputTypes = Seq(StringType)

  @transient private lazy val tokenizer = new BpeTokenizer(vocab.toArray)

  override def nullSafeEval(input: Any): Any =
    tokenizer.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tok = ctx.addReferenceObj("bpeTokenizer", tokenizer,
      classOf[BpeTokenizer].getName)
    defineCodeGen(ctx, ev, c => s"$tok.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  /** Column builder over the registered function (canonical vocab —
    * [[graft.functions.TextFunctions.BpeVocab]]). */
  def apply(c: Column): Column = call_function("bpe_token_count", c)
}

/** The compiled tokenizer the generated code calls (shipped to
  * executors as a serialized codegen reference). */
class BpeTokenizer(val vocab: Array[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(v => s.add(v))
    s
  }
  @transient private lazy val maxLen: Int = vocab.map(_.length).max

  def count(text: UTF8String): Long = {
    val m = BpeTokenizer.Pieces.matcher(text.toString)
    var total = 0L
    while (m.find()) {
      val piece = m.group()
      val c0 = piece.charAt(0)
      if ((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))
        total += subwordCount(piece.toLowerCase(java.util.Locale.ROOT))
      else total += 1
    }
    total
  }

  /** Greedy longest-match token count of one lowercased letter run. */
  private def subwordCount(w: String): Long = {
    var pos = 0
    var n = 0L
    while (pos < w.length) {
      var adv = 0
      var l = math.min(maxLen, w.length - pos)
      while (l >= 1 && adv == 0) {
        if (set.contains(w.substring(pos, pos + l))) adv = l
        l -= 1
      }
      if (adv == 0) adv = 1 // unknown char fallback
      pos += adv
      n += 1
    }
    n
  }
}

object BpeTokenizer {
  /** Compiled [[graft.functions.TextFunctions.BpeRegex]]. */
  private[plans] val Pieces: Pattern =
    Pattern.compile(graft.functions.TextFunctions.BpeRegex)
}
