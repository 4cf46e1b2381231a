package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap for [[TopKPairs]]: keeps the k best (score, id)
  * pairs, "best" = highest score, ties to the LOWEST id (the engine's
  * deterministic tie order). The heap root is always the WORST kept
  * pair, so admission is O(1) reject / O(log k) replace.
  */
final class TopKHeap(val k: Int) {
  // binary min-heap on (score asc, id desc): root = worst kept pair
  private var scores = new Array[Double](math.max(k, 1))
  private var ids = new Array[Long](math.max(k, 1))
  private var n = 0

  /** a strictly worse than b: lower score, or same score + higher id.
    * Compared via java.lang.Double.compare for a TOTAL order: with
    * primitive `<`, every comparison against NaN is false, so a NaN
    * score (0/0 cosine from a zero-norm embedding) that entered while
    * the heap was filling could never be evicted and would silently
    * displace genuinely better pairs. Double.compare ranks NaN above
    * every real score — the same NaN-largest order Spark's own sort
    * and row_number use, so output stays consistent with the window
    * formulation this aggregate replaced. */
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  def size: Int = n
  def scoreAt(i: Int): Double = scores(i)
  def idAt(i: Int): Long = ids(i)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      val p = (i - 1) / 2
      swap(i, p); i = p
    }
  }
  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }
  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def add(score: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }
  }

  def mergeFrom(o: TopKHeap): Unit = {
    var i = 0
    while (i < o.size) { add(o.scoreAt(i), o.idAt(i)); i += 1 }
  }

  /** Kept pairs as (score, id) sorted best-first (same total order as
    * `worse`, so NaN sorts first, ids break ties ascending). */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
  }
}

/** Aggregate `top_k_pairs(score, id, k)`: the k highest-scoring
  * (score, id) pairs per group as array<struct<score,id>> sorted
  * best-first, ties to the lowest id.
  *
  * This is the scale-correct shape for per-group top-k: as a
  * TypedImperativeAggregate it participates in PARTIAL aggregation
  * (ObjectHashAggregate), so each map partition forwards at most k
  * pairs per group — a window row_number() over the same grouping
  * must instead shuffle EVERY candidate row to its group's partition
  * and sort there. For a similarity scan that is the difference
  * between shuffling k·|groups|·mappers rows and shuffling
  * |corpus|·|queries| rows. The buffer serializes as 16 bytes/pair.
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap]
    with BinaryLike[Expression] with ImplicitCastInputTypes {
  require(k >= 1, s"top_k_pairs k=$k must be >= 1")

  override def left: Expression = score
  override def right: Expression = id
  // no explicit Seq[AbstractDataType] annotation: that type is
  // private[sql] in Spark 4 (same pattern as the other graft exprs)
  override def inputTypes = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKHeap, o: TopKHeap): TopKHeap = { b.mergeFrom(o); b }

  override def eval(b: TopKHeap): Any =
    new GenericArrayData(b.sorted.map { case (s, i) =>
      InternalRow(s, i): Any
    })

  override def serialize(b: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * b.size)
    bb.putInt(b.k); bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scoreAt(i)); bb.putLong(b.idAt(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { heap.add(bb.getDouble(), bb.getLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): TopKPairs =
    copy(score = newLeft, id = newRight)
}
