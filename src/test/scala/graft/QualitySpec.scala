package graft

import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val parent = Seq(1L, 2L, 3L).toDF("pk")
  private val child = Seq((10L, 1L), (11L, 2L), (12L, 99L), (13L, 98L))
    .toDF("id", "fk")

  test("orphans returns exactly the child rows with no parent") {
    val out = Quality.orphans(child, "fk", parent, "pk")
      .select("id").as[Long].collect().toSet
    assert(out === Set(12L, 13L))
  }

  test("fkAudit emits one labeled count row per check") {
    val rows = Quality.fkAudit(Seq(
      (child, "fk", parent, "pk", "child_parent"),
      (parent, "pk", parent, "pk", "parent_self")))
      .as[(String, Long, Long)].collect().toSet
    assert(rows === Set(("child_parent", 2L, 4L), ("parent_self", 0L, 3L)))
  }
}
