package graft

/** Recall floors for the approximate-retrieval REGISTRY entries at
  * sf0.1 scale — the r13 verdict's dirty-tree lesson: a parameter
  * experiment (one observed audit run read ss_lsh 0.425) could ship a
  * recall collapse without any committed gate failing, because the
  * driver's rows-only check sees "some rows" and the small-corpus
  * specs pin planted fixtures, not the shipped defaults at scale.
  *
  * These tests run the registry functions themselves — the shipped
  * nBits/bands/nprobe defaults, nothing re-specified — on the fixed
  * sf0.1 tables and pin the self-audit `recall` column at >= 0.8.
  * Everything in the path is deterministic on fixed data (seeded
  * hyperplanes, deterministic k-means), so the floor carries no seed
  * variance: a failure means a default changed or an operator
  * regressed. Measured at HEAD: ss_lsh 0.92, ss_ivf 0.90,
  * dd_embedding_lsh 0.94. ss_ivf additionally carries the ADVERTISED
  * >= 0.85 floor (SURVEY §13) — nprobe is sized to hold it with
  * margin at every SF, so the floor here matches the docs instead of
  * a weaker 0.8 that lets the advertised number drift silently
  * (r16's 0.8425 did exactly that).
  */
class RecallFloorSpec extends SparkSpec {
  import spark.implicits._

  private val Dir = "/root/testdata/sf0.1"

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val r = df.select("recall").as[Double].collect()
    assert(r.nonEmpty, "audited query returned no rows")
    assert(r.distinct.length === 1, "audit column must be constant")
    r.head
  }

  test("ss_lsh_topk registry defaults hold recall@10 >= 0.8 at sf0.1") {
    val rec = recallOf(
      queries.SimilarityQueries.queries("ss_lsh_topk")(spark, Dir))
    assert(rec >= 0.8, s"ss_lsh_topk sf0.1 recall collapsed: $rec (measured 0.92)")
  }

  test("ss_ivf_topk registry defaults hold recall@10 >= 0.85 at sf0.1") {
    val rec = recallOf(
      queries.SimilarityQueries.queries("ss_ivf_topk")(spark, Dir))
    assert(rec >= 0.85, s"ss_ivf_topk sf0.1 recall under the advertised floor: $rec (measured 0.90 at nprobe=7)")
  }

  test("dd_embedding_lsh registry defaults hold pair recall >= 0.8 at sf0.1") {
    val rec = recallOf(
      queries.DedupQueries.queries("dd_embedding_lsh")(spark, Dir))
    assert(rec >= 0.8, s"dd_embedding_lsh sf0.1 recall collapsed: $rec (measured 0.94)")
  }

  test("st_ivf_serve holds the advertised recall@10 >= 0.85 at sf0.1") {
    // the streamed IVF probe serves the SAME staged index as
    // ss_ivf_topk, so its recall must match the batch row's — a drift
    // between them means the foreachBatch path stopped using the index
    val rec = recallOf(
      queries.SimilarityQueries.queries("st_ivf_serve")(spark, Dir))
    assert(rec >= 0.85, s"st_ivf_serve sf0.1 recall under the advertised floor: $rec")
  }
}
