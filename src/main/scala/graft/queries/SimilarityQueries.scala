package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search block over `embeddings` (SURVEY §2 "Similarity
  * search"). Query set = every 50th vector. ss_brute_topk is exact and
  * oracle-checked; ss_lsh_topk / ss_ivf_topk are approximate (rows-only
  * check; recall asserted against brute force in SimilaritySpec).
  */
object SimilarityQueries {

  val K = 10
  /** Embedding dimensionality of the synthetic table. */
  val Dim = 64

  private def data(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)

  private def querySet(s: SparkSession, dir: String): DataFrame =
    data(s, dir).filter(col("vec_id") % 50 === 0)

  /** Exact brute-force top-k staged once per (session, dir) for the
    * TWO ANN recall audits — without staging the exhaustive scan ran
    * once per audit. The registered ss_brute_topk does NOT read this
    * stage: a headline query's bench number must measure its own
    * work, not a cache hit; only shared audit infrastructure stages. */
  private def bruteBase(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stage.frame(s, dir, "ss_brute") {
      Similarity.bruteTopK(data(s, dir), querySet(s, dir), "vec_id",
        "embedding", K)
    }

  def ssBruteTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteTopK(data(s, dir), querySet(s, dir), "vec_id",
      "embedding", K)
      .orderBy("q_id", "rank")

  val ssBruteTopKSql: String = """
    |WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    |n AS (SELECT vec_id, e,
    |        sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm FROM v),
    |q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
    |p AS (SELECT q.vec_id AS q_id, d.vec_id AS vec_id,
    |        round(list_sum(list_transform(list_zip(q.e, d.e), z -> z[1]*z[2]))
    |          / (q.nrm * d.nrm), 6) AS cos
    |      FROM q JOIN n d ON d.vec_id != q.vec_id),
    |r AS (SELECT q_id, vec_id, cos,
    |        row_number() OVER (PARTITION BY q_id
    |          ORDER BY cos DESC, vec_id) AS rank
    |      FROM p)
    |SELECT q_id, vec_id, cos, rank FROM r WHERE rank <= 10
    |ORDER BY q_id, rank""".stripMargin

  /** ANN queries self-audit: recall@k against the exact brute-force
    * top-k (VERDICT r3 item 7 — the rows-only check sees a quality
    * number, not just a count). */
  def ssLshTopK(s: SparkSession, dir: String): DataFrame =
    graft.operators.Audit.withRecall(
      Similarity.lshTopK(data(s, dir), querySet(s, dir), "vec_id", "embedding",
        Dim, K),
      bruteBase(s, dir),
      Seq("q_id", "vec_id"))
      .orderBy("q_id", "rank")

  def ssIvfTopK(s: SparkSession, dir: String): DataFrame =
    graft.operators.Audit.withRecall(
      // nprobe = 4 of the label quantizer's 10 cells: ranks 2..k sit at
      // the synthetic corpus's cosine noise floor, so recall scales
      // ~ nprobe/cells no matter how good the quantizer is — 4 probes
      // put audited recall ≈ 0.5 at 40% of the exhaustive scan (a real
      // deployment uses C ≈ √N cells with nprobe ≪ C; the 10-cell
      // coarseness is the testdata's, not the operator's).
      Similarity.ivfTopK(data(s, dir), querySet(s, dir), "vec_id", "embedding",
        clusterCol = "label", k = K, nprobe = 4),
      bruteBase(s, dir),
      Seq("q_id", "vec_id"))
      .orderBy("q_id", "rank")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss_brute_topk" -> (ssBruteTopK _),
    "ss_lsh_topk" -> (ssLshTopK _),
    "ss_ivf_topk" -> (ssIvfTopK _))

  val oracles: Map[String, String] = Map(
    "ss_brute_topk" -> ssBruteTopKSql)
}
