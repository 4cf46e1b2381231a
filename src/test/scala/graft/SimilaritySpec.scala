package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.select("q_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap

  test("bruteTopK returns k rows per query, self excluded, ranks 1..k") {
    val out = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 5)
    val byQ = ranks(out).groupBy(_._1._1)
    val nq = queries.count()
    assert(byQ.size === nq)
    byQ.foreach { case (q, rows) =>
      assert(rows.values.toSeq.sorted === (1L to 5L))
      assert(!rows.keySet.contains((q, q)))
    }
  }

  test("lshTopK candidates are a subset ranked consistently with brute force") {
    val brute = ranks(Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 10))
    val lsh = ranks(Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 10))
    // ANN: every returned neighbor must be a real vector pair; recall@10
    // should be well above chance (bucketing prunes, not randomizes)
    val recall = lsh.keySet.count(brute.keySet.contains).toDouble / brute.size
    assert(recall > 0.2, s"LSH recall@10 too low: $recall")
  }

  test("ivfTopK with nprobe = all clusters equals brute force") {
    val ivf = ranks(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      clusterCol = "label", k = 10, nprobe = 10))
    val brute = ranks(Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 10))
    assert(ivf === brute)
  }
}
