package graft

import org.apache.spark.sql.DataFrame

object Scratch {
  def time(name: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions._

    val dir = "/root/testdata/sf0.1"
    val nBits = 32; val bands = 8; val dim = 64; val thr = 0.45
    val r = nBits / bands; val mask = (1L << r) - 1

    def e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("__id"), toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", normPre(col("emb")))
    def banded = graft.operators.Par.spread(e.select(col("__id"), col("emb")))
      .withColumn("sig", hyperplaneSigPre(col("emb"), nBits, dim))
      .select(col("__id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * r).bitwiseAND(lit(mask)).as("v"))
      }: _*)).as("bh"))
      .select(col("__id"), col("bh.band").as("band"), col("bh.v").as("v"))
    def bounded = banded
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("band", "v")))
      .filter(col("__bn") <= 1000)
      .drop("__bn")
    def cand = bounded.select(col("band"), col("v"), col("__id").as("a_id"))
      .join(bounded.select(col("band"), col("v"), col("__id").as("b_id")),
        Seq("band", "v"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    def verified = cand
      .join(e.select(col("__id").as("a_id"), col("emb").as("ea"), col("nrm").as("na")), "a_id")
      .join(e.select(col("__id").as("b_id"), col("emb").as("eb"), col("nrm").as("nb")), "b_id")
      .withColumn("cos", dotPre(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= thr)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))

    for (i <- 1 to 3) {
      time(s"banded r$i")(banded)
      time(s"bounded r$i")(bounded)
      time(s"cand r$i")(cand)
      time(s"verified r$i")(verified)
    }
    println("cand count: " + cand.count())
    spark.stop()
  }
}
