package graft

import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, 100L, 1.0, "base"), (2L, 100L, 2.0, "base"),
    (3L, 100L, 3.0, "base")).toDF("id", "tu", "v", "src")

  test("newest row per key wins; untouched keys pass through") {
    val upd = Seq((1L, 200L, 9.0, "update")).toDF("id", "tu", "v", "src")
    val out = Cdc.latestWins(base, upd, Seq("id"), Seq("tu", "src"))
      .select("id", "v", "src").as[(Long, Double, String)].collect().toSet
    assert(out === Set((1L, 9.0, "update"), (2L, 2.0, "base"), (3L, 3.0, "base")))
  }

  test("exact-timestamp tie breaks deterministically by the src tag") {
    val upd = Seq((2L, 100L, 8.0, "update")).toDF("id", "tu", "v", "src")
    val out = Cdc.latestWins(base, upd, Seq("id"), Seq("tu", "src"))
      .filter($"id" === 2L).select("v", "src").as[(Double, String)].head()
    assert(out === ((8.0, "update"))) // 'update' > 'base' descending
  }
}
