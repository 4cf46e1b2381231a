package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
    (2L, Array(1.0f, 2.0f, -3.0f, 0.0f)),
    (3L, Array(0.1f, 0.2f, 0.3f, 0.4f))).toDF("id", "v")

  test("ArrayDot is bit-identical to the aggregate/zip_with fold") {
    val a = col("v")
    val hof = aggregate(zip_with(toDouble(a), toDouble(a), _ * _), lit(0.0), _ + _)
    val out = vecs.select((dot(a, a) === hof).as("eq")).as[Boolean].collect()
    assert(out.forall(identity)) // exact ==, not approx: same fold order
  }

  test("cosine of a vector with itself is 1") {
    val out = vecs.select(cosine(col("v"), col("v"))).as[Double].collect()
    out.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("cosine of orthogonal vectors is 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 3.0f))).toDF("a", "b")
    assert(df.select(cosine(col("a"), col("b"))).as[Double].head() === 0.0)
  }

  test("hyperplaneSig is deterministic and separates distant vectors") {
    val df = Seq(
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(1.0f)),          // identical -> same sig
      (3L, Array.fill(8)(-1.0f))).toDF("id", "v") // opposite -> complement sig
    val sigs = df.select(col("id"), hyperplaneSig(col("v"), 16, 8).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert((sigs(1L) ^ sigs(3L)) === (1L << 16) - 1) // every bit flips
  }

  test("norm handles the zero vector") {
    val df = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
    assert(df.select(norm(col("v"))).as[Double].head() === 0.0)
  }

  test("ArrayDot rejects null elements instead of emitting garbage") {
    val df = Seq(Tuple1(Seq[java.lang.Double](1.0, null, 3.0))).toDF("v")
    val e = intercept[Exception] {
      df.select(graft.plans.ArrayDot(col("v"), col("v"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("null element")))
  }

  test("ArrayDot rejects length mismatch") {
    val df = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.plans.ArrayDot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null && c.getMessage.contains("length mismatch")))
  }
}
