package graft

import graft.operators.RankOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exactNtile matches ntile() for uneven splits") {
    // 23 rows into 10 tiles: first 3 tiles get 3 rows, rest get 2
    val df = (1 to 23).map(i => (i.toLong * 7 % 23, i.toLong)).toDF("v", "id")
    val expected = df.withColumn("t",
      ntile(10).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "t").as[(Long, Long)].collect().toMap
    val got = RankOps.exactNtile(df, "v", "id", 10, "t", buckets = 4)
      .select("id", "t").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("exactNtile with fewer rows than tiles numbers rows 1..N") {
    val df = Seq((5.0, 1L), (1.0, 2L), (3.0, 3L)).toDF("v", "id")
    val got = RankOps.exactNtile(df, "v", "id", 10, "t")
      .select("id", "t").as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 1L, 3L -> 2L, 1L -> 3L))
  }

  test("withGlobalRank is a total order with duplicate sort values") {
    val df = Seq((1.0, 3L), (1.0, 1L), (1.0, 2L), (0.5, 9L)).toDF("v", "id")
    val got = RankOps.withGlobalRank(df, "v", "id", buckets = 2)
      .select("id", "__grank").as[(Long, Long)].collect().toMap
    assert(got === Map(9L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L))
  }

  test("withGlobalRank on empty frame returns empty") {
    val df = Seq.empty[(Double, Long)].toDF("v", "id")
    assert(RankOps.withGlobalRank(df, "v", "id").count() === 0)
  }

  test("withGlobalRank keeps null sort values, ranked first (NULLS FIRST)") {
    val df = Seq((Some(2.0), 1L), (None, 2L), (Some(1.0), 3L), (None, 4L))
      .toDF("v", "id")
    val got = RankOps.withGlobalRank(df, "v", "id", buckets = 2)
      .select("id", "__grank").as[(Long, Long)].collect().toMap
    // same order row_number() OVER (ORDER BY v ASC, id ASC) produces:
    // ASC is NULLS FIRST in Spark SQL
    assert(got === Map(2L -> 1L, 4L -> 2L, 3L -> 3L, 1L -> 4L))
  }

  test("withGlobalRank on an all-null sort column ranks by tie column") {
    val df = Seq((Option.empty[Double], 3L), (None, 1L), (None, 2L)).toDF("v", "id")
    val got = RankOps.withGlobalRank(df, "v", "id")
      .select("id", "__grank").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
