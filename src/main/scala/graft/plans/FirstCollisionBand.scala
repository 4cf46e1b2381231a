package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** The earliest band where two banded LSH signatures agree AND the
  * (shared) bucket survived the degenerate-bucket cap — or -1 when no
  * band qualifies.
  *
  * This is the first-collision candidate dedup of the banded LSH
  * self-join (Dedup.embeddingPairsLsh) as ONE tight loop: the join emits
  * a pair only from `band = first_collision_band(a_vals, b_vals,
  * a_mask)`, so a pair colliding in k bands still surfaces exactly once
  * — no candidate-set distinct shuffle — and a pair whose earliest
  * agreeing band was capped re-emits from the next surviving one. The
  * Boolean-tree form of the same predicate (bands-1 disjuncts, each
  * two element_at array probes) evaluated per MATCHED bucket row; at
  * ~10^6 matches per 2k docs that interpreted walk was ~7 s of the
  * query — this call is a few ns. Bit b of `aMask` says "this doc's
  * band-b bucket was not capped"; agreeing values put both docs in the
  * SAME bucket, so one side's mask decides (the survived-band mask the
  * caller computes per doc).
  */
case class FirstCollisionBand(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_collision_band"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), LongType)

  override def nullSafeEval(a: Any, b: Any, m: Any): Any =
    FirstCollisionBand.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, m) =>
      s"graft.plans.FirstCollisionBand.compute($a, $b, $m)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FirstCollisionBand =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object FirstCollisionBand {
  def apply(aVals: Column, bVals: Column, aMask: Column): Column =
    call_function("first_collision_band", aVals, bVals, aMask)

  /** Called from generated code. Length mismatch throws (two signatures
    * from the same banding always agree on length; a mismatch is a
    * caller bug, not data). */
  def compute(a: ArrayData, b: ArrayData, mask: Long): Int = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"first_collision_band: length mismatch ($n vs ${b.numElements()})")
    }
    var j = 0
    while (j < n) {
      if (((mask >>> j) & 1L) == 1L && a.getLong(j) == b.getLong(j)) return j
      j += 1
    }
    -1
  }
}
