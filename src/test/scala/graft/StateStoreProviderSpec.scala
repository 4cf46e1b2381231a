package graft

/** Store-independence gate for the SPARK_GRAFT_STATE_PROVIDER
  * deployment knob: the same stateful replay must produce
  * HASH-IDENTICAL results under the default HDFS-backed store and
  * under RocksDB. The knob exists because at deployment state sizes
  * (dedup key spaces / session maps past executor heap) RocksDB is the
  * right default even though the local sf1 A/B rejected it at this
  * harness's sizes (SCALE.md round 15) — a perf knob must never be a
  * semantics knob.
  *
  * st_session_window is the gate query: flatMapGroupsWithState-free
  * but stateful (session-window aggregation), so every batch round-trips
  * the state store. The provider swap rides the THREAD-scoped
  * StreamOps.ProviderOverride (not the global sys-prop — that would
  * leak RocksDB into concurrently-running suites' replays).
  */
class StateStoreProviderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(): Seq[String] = {
    val df = SparkEntry.queries("st_session_window")(spark, sf)
    df.collect().map(_.toString).sorted.toSeq
  }

  test("a stateful replay is hash-identical under RocksDB") {
    val default = rows()
    assert(default.nonEmpty, "gate query returned no rows")
    // thread-scoped override, NOT the global sys-prop: mutating the
    // prop would flip concurrently-running suites' replays onto
    // RocksDB for this test's window (r17 advice finding)
    val rocks = graft.streaming.StreamOps.ProviderOverride.withValue(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )) { rows() }
    assert(rocks === default,
      "st_session_window diverged between state store providers")
  }
}
