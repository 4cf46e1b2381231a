package graft

import graft.operators.Stage
import org.apache.spark.sql.functions._

/** Stage memo lifecycle: entries must not outlive their session. */
class StageSpec extends SparkSpec {

  test("evict releases a session's staged entries") {
    val s2 = spark.newSession()
    val before = Stage.entriesFor(s2)
    Stage.frame(s2, "/tmp/stage-spec", "a")(s2.range(10).toDF())
    Stage.frame(s2, "/tmp/stage-spec", "b")(s2.range(20).toDF())
    assert(Stage.entriesFor(s2) === before + 2)
    assert(Stage.evict(s2) === before + 2)
    assert(Stage.entriesFor(s2) === 0)
    // spark (the shared suite session) keeps its own entries untouched
  }

  test("staged frame is built once and reused per (session, dir, key)") {
    var builds = 0
    def build = { builds += 1; spark.range(3).toDF() }
    val f1 = Stage.frame(spark, "/tmp/stage-spec-3", "k")(build)
    val f2 = Stage.frame(spark, "/tmp/stage-spec-3", "k")(build)
    assert(builds === 1)
    assert(f1 eq f2)
    assert(f1.count() === 3)
    Stage.evict(spark)
  }
}
