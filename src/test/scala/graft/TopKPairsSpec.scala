package graft

import org.apache.spark.sql.functions._

class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(call_function("top_k_pairs", col("s"), col("i"), lit(k)).as("tk"))

  test("keeps the k best pairs sorted desc, ties to the lowest id") {
    val df = Seq(
      ("a", 1.0, 10L), ("a", 3.0, 11L), ("a", 2.0, 12L),
      ("a", 3.0, 9L), ("a", 0.5, 13L)).toDF("g", "s", "i")
    val out = agg(df, 3).select("tk").as[Seq[(Double, Long)]].head()
    assert(out === Seq((3.0, 9L), (3.0, 11L), (2.0, 12L)))
  }

  test("k larger than the group returns everything, still sorted") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("g", "s", "i")
    val out = agg(df, 10).select("tk").as[Seq[(Double, Long)]].head()
    assert(out === Seq((2.0, 2L), (1.0, 1L)))
  }

  test("merges across partitions identically to a single partition") {
    val rows = (1 to 500).map(i => ("g", (i % 97).toDouble, i.toLong))
    val spread = agg(rows.toDF("g", "s", "i").repartition(13), 7)
      .select("tk").as[Seq[(Double, Long)]].head()
    val single = agg(rows.toDF("g", "s", "i").coalesce(1), 7)
      .select("tk").as[Seq[(Double, Long)]].head()
    assert(spread === single)
    assert(spread.length === 7)
  }

  test("null scores and ids are ignored, empty group yields empty array") {
    val df = Seq(
      ("a", Some(2.0), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(1.0), None), ("b", None, None)).toDF("g", "s", "i")
    val out = agg(df, 3).orderBy("g").select("tk")
      .as[Seq[(Double, Long)]].collect()
    assert(out(0) === Seq((2.0, 1L)))
    assert(out(1) === Seq.empty)
  }

  test("plans as ObjectHashAggregate with a partial pass") {
    val df = Seq(("a", 1.0, 1L)).toDF("g", "s", "i")
    val plan = agg(df, 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k_pairs"), plan)
  }
}
