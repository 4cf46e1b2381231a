package graft

/** [[RecallFloorSpec]] at the 10x shards: the r13 dd_embedding_lsh
  * recall collapse (0.23) was ONLY visible at sf1 — the sf0.1 floor
  * spec passed through it — so the scale-representative corpus gets
  * its own guarded floor. Skipped (cancelled) when /tmp/graft-sf1 is
  * absent: the shards are derived scratch (GenScale), not driver
  * testdata, and a fresh container runs the sf0.1 suite only.
  * Measured at HEAD: ss_lsh 0.96, ss_ivf 0.90, dd_embedding_lsh 0.92.
  */
class RecallFloorSf1Spec extends SparkSpec {
  import spark.implicits._

  private val Dir = "/tmp/graft-sf1"
  private def shardsPresent: Boolean =
    java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(Dir, "embeddings.parquet"))

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val r = df.select("recall").as[Double].collect()
    assert(r.nonEmpty, "audited query returned no rows")
    assert(r.distinct.length === 1, "audit column must be constant")
    r.head
  }

  test("ss_lsh_topk registry defaults hold recall@10 >= 0.8 at sf1") {
    assume(shardsPresent, s"$Dir absent — run Test/runMain graft.GenScale first")
    val rec = recallOf(
      queries.SimilarityQueries.queries("ss_lsh_topk")(spark, Dir))
    assert(rec >= 0.8, s"ss_lsh_topk sf1 recall collapsed: $rec (measured 0.96)")
  }

  test("ss_ivf_topk registry defaults hold recall@10 >= 0.85 at sf1") {
    assume(shardsPresent, s"$Dir absent — run Test/runMain graft.GenScale first")
    val rec = recallOf(
      queries.SimilarityQueries.queries("ss_ivf_topk")(spark, Dir))
    assert(rec >= 0.85, s"ss_ivf_topk sf1 recall under the advertised floor: $rec (measured 0.90 at nprobe=7)")
  }

  test("dd_embedding_lsh registry defaults hold pair recall >= 0.8 at sf1") {
    assume(shardsPresent, s"$Dir absent — run Test/runMain graft.GenScale first")
    val rec = recallOf(
      queries.DedupQueries.queries("dd_embedding_lsh")(spark, Dir))
    assert(rec >= 0.8, s"dd_embedding_lsh sf1 recall collapsed: $rec (measured 0.92)")
  }

  test("st_ivf_serve holds the advertised recall@10 >= 0.85 at sf1") {
    assume(shardsPresent, s"$Dir absent — run Test/runMain graft.GenScale first")
    val rec = recallOf(
      queries.SimilarityQueries.queries("st_ivf_serve")(spark, Dir))
    assert(rec >= 0.85, s"st_ivf_serve sf1 recall under the advertised floor: $rec")
  }
}
