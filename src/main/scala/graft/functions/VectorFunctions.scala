package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over array<float>/array<double>
  * embeddings. Built from higher-order functions (`zip_with` +
  * `aggregate`) so vectors stay packed (no row explosion of elements) and
  * everything is codegen'd — the scale-safe shape for 100 TB of
  * embedding rows.
  *
  * All math is done in double after an explicit cast so results are
  * bit-comparable with a DuckDB oracle casting to DOUBLE[].
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane signature bits for LSH bucketing: bit i = sign of
    * dot(v, h_i) where h_i is a deterministic pseudo-random hyperplane
    * derived from xxhash64(i, dim). Packed to a Long. */
  def hyperplaneSig(v: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { i =>
      // pseudo-hyperplane component for (bit i, element j): map xxhash64
      // to [-0.5, 0.5) deterministically
      val proj = aggregate(
        zip_with(toDouble(v), sequence(lit(0), size(v) - 1),
          (x, j) => x * (pmod(xxhash64(lit(i), j), lit(1000000L)).cast("double") / 1000000.0 - 0.5)),
        lit(0.0), _ + _)
      when(proj >= 0, lit(1L) << i).otherwise(0L)
    }
    bits.reduce(_ bitwiseOR _)
  }
}
