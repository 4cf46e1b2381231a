package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** AllPairs prefix under the STOP-SHINGLE-LAST total order, in one
  * in-row pass (round-19 TextSkewProbe finding: a zipf corpus put
  * 4.1M candidate rows through dd_ngram_jaccard's prefix join vs 60
  * under a frequency-aware order — a corpus-hot shingle whose hash
  * happens to sort low lands in EVERY containing doc's prefix, and its
  * bucket is quadratic in its document frequency).
  *
  * The global order the prefix proof runs on becomes: non-hot shingles
  * by hash ascending (exactly today's order), then hot shingles by
  * their position in the supplied `hot` list. Any corpus-consistent
  * total order preserves AllPairs recall (the proof only needs "every
  * qualifying pair shares one of the k order-smallest elements of each
  * set"), so the result is row-identical to the hash-order prefix —
  * only the candidate volume changes. Bayardo's canonical ascending-df
  * order does this perfectly but needs a per-doc re-sort against a
  * corpus-wide frequency table; hot-list-exclusion captures the
  * quadratic tail (buckets above the df floor) with ONE binary search
  * per element against a bounded list and no re-sort: since `hs` is
  * already hash-sorted, the k order-smallest elements are simply the
  * first k non-hot entries, plus (only when a doc is nearly all hot)
  * the doc's hot entries in list order.
  *
  * `hs` must be ascending-sorted (SortedShingleHashes), `k >= 1`, and
  * `hot` a foldable array literal — its VALUES in the caller's chosen
  * hot-order (rank = index). An empty list reproduces `slice(hs, 1, k)`
  * exactly; callers skip this expression entirely then.
  */
case class PrefixSkipHot(left: Expression, right: Expression,
                         hot: Seq[Long])
  extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "prefix_skip_hot"
  override def inputTypes = Seq(ArrayType(LongType), IntegerType)

  @transient private lazy val tables = new PrefixSkipHot.Tables(hot.toArray)

  override def nullSafeEval(hs: Any, k: Any): Any =
    PrefixSkipHot.compute(hs.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("hotTbl", tables,
      classOf[PrefixSkipHot.Tables].getName)
    defineCodeGen(ctx, ev, (h, k) =>
      s"graft.plans.PrefixSkipHot.compute($h, $k, $tbl)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrefixSkipHot =
    copy(left = newLeft, right = newRight)
}

object PrefixSkipHot {

  /** Hot lookup tables as one codegen reference object: values sorted
    * for the membership binary search, plus each sorted value's rank
    * (= index in the caller's hot-order list) for the fill path. */
  final class Tables(hotInRankOrder: Array[Long]) extends Serializable {
    val sorted: Array[Long] = {
      val s = hotInRankOrder.clone(); java.util.Arrays.sort(s); s
    }
    val rankOfSorted: Array[Int] = {
      val idx = new java.util.HashMap[java.lang.Long, Integer](
        hotInRankOrder.length * 2)
      var i = 0
      while (i < hotInRankOrder.length) {
        // duplicate values keep their FIRST rank — a duplicate in the
        // hot list is one order key either way
        idx.putIfAbsent(hotInRankOrder(i), i); i += 1
      }
      sorted.map(v => idx.get(v).intValue())
    }
  }

  def apply(hs: Column, k: Column, hot: Seq[Long]): Column =
    call_function("prefix_skip_hot", hs, k,
      lit(hot.toArray))

  /** Called from generated code. */
  def compute(hs: ArrayData, k: Int, tbl: Tables): ArrayData = {
    val n = hs.numElements()
    val cap = if (k < n) k else n
    val out = new Array[Long](cap)
    var m = 0
    var i = 0
    while (i < n && m < cap) {
      val v = hs.getLong(i)
      if (java.util.Arrays.binarySearch(tbl.sorted, v) < 0) {
        out(m) = v; m += 1
      }
      i += 1
    }
    if (m < cap) {
      // fill from the doc's hot elements in hot-list order: the global
      // order places hot shingles after every non-hot one, ranked by
      // list position — only reached when a doc is nearly all hot
      val fill = new java.util.TreeMap[Integer, java.lang.Long]()
      i = 0
      while (i < n) {
        val v = hs.getLong(i)
        val p = java.util.Arrays.binarySearch(tbl.sorted, v)
        if (p >= 0) fill.put(tbl.rankOfSorted(p), v)
        i += 1
      }
      val it = fill.values().iterator()
      while (m < cap && it.hasNext) { out(m) = it.next(); m += 1 }
    }
    new GenericArrayData(
      if (m == cap) out else java.util.Arrays.copyOf(out, m))
  }
}
