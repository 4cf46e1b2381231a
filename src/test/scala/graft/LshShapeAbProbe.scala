package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for ss_lsh_topk's candidate shape (r19, after the sf10 OOM):
  * OLD = band explode → id-only bucket join → candidate distinct() →
  * re-join corpus payload → re-join broadcast queries; NEW (shipped,
  * Similarity.lshTopK) = fused band probe with the first-collision
  * predicate — no distinct, no corpus exchange. The probe asserts the
  * two shapes return IDENTICAL rows (the first-collision proof: every
  * pair surfaces exactly once, from its earliest agreeing band), prints
  * both physical plans, and times both.
  *
  *   Test/runMain graft.LshShapeAbProbe [sfDir] [reps]
  */
object LshShapeAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.get()
    import graft.functions.VectorFunctions._
    val dim = graft.queries.SimilarityQueries.Dim
    val k = graft.queries.SimilarityQueries.K
    val (nBits, bands) = (30, 10)
    val r = nBits / bands
    val mask = (1L << r) - 1
    val data = Tables.embeddings(spark, dir)
    val queries = data.filter(col("vec_id") % 50 === 0)
    def withNorm(df: DataFrame, p: String): DataFrame =
      df.select(col("vec_id").as(s"${p}id"), toDouble(col("embedding")).as(s"${p}emb"))
        .withColumn(s"${p}nrm", normPre(col(s"${p}emb")))
    def topK(scored: DataFrame): DataFrame = scored
      .withColumn("cos", round(
        dotPre(col("qemb"), col("demb")) / (col("qnrm") * col("dnrm")), 6))
      .groupBy(col("qid").as("q_id"))
      .agg(call_function("top_k_pairs", col("cos"), col("did"), lit(k)).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("r0", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"), col("s.score").as("cos"),
        (col("r0") + 1).cast("long").as("rank"))
      .orderBy("q_id", "rank")
    // OLD shape (pre-r19): struct-banded id rows, global distinct, re-joins
    def oldShape(): DataFrame = {
      val d0 = withNorm(data, "d")
      val q0 = withNorm(queries, "q")
      def banded(df: DataFrame, p: String): DataFrame =
        df.withColumn("__b", explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(hyperplaneSigPre(col(s"${p}emb"), nBits, dim), b * r)
              .bitwiseAND(lit(mask)).as("v"))
        }: _*)))
          .select(col(s"${p}id"), col("__b.band").as("band"), col("__b.v").as("v"))
      val cand = banded(d0, "d").join(broadcast(banded(q0, "q")), Seq("band", "v"))
        .filter(col("did") =!= col("qid"))
        .select("qid", "did").distinct()
        .join(d0, "did").join(broadcast(q0), "qid")
      topK(cand)
    }
    def newShape(): DataFrame =
      graft.operators.Similarity.lshTopK(data, queries, "vec_id", "embedding",
        dim, k).orderBy("q_id", "rank")
    val a = oldShape().collect().map(_.toString).toSeq
    val b = newShape().collect().map(_.toString).toSeq
    require(a == b, s"shapes disagree: old=${a.take(5)}... new=${b.take(5)}...")
    println(s"LSHAB shapes row-identical: ${a.size} rows")
    println("===== OLD plan ====="); oldShape().explain("formatted")
    println("===== NEW plan ====="); newShape().explain("formatted")
    for ((name, body) <- Seq("old" -> (() => oldShape()), "new" -> (() => newShape()))) {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        body().write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        if (i > 1 && t < best) best = t
      }
      println(f"LSHAB $name steady-min $best%6.3f s")
    }
    spark.stop()
  }
}
