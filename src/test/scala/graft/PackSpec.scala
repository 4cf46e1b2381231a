package graft

import graft.operators.Pack
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("prefixSum equals the sequential scan, sparse ids, any bucket count") {
    // sparse, unordered insert order; offsets follow id order
    val rows = Seq((7L, 10L), (1L, 3L), (100L, 5L), (42L, 7L), (3L, 2L))
    val want = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (id, t)) => (id, acc + t) }
      .sliding(2).map { case Seq((_, prev), (id, _)) => id -> prev }.toMap
    for (buckets <- Seq(1, 3, 64)) {
      val got = Pack.prefixSum(rows.toDF("doc_id", "nt"), "doc_id", "nt", buckets)
        .select(col("doc_id"), col("__offset")).as[(Long, Long)]
        .collect().toMap
      assert(got === want, s"buckets=$buckets")
    }
  }

  test("packSequences chunks the token stream at the sequence size") {
    // tokens 1000+1000 fill seq 0; next doc starts at 2000 -> seq 0
    // (2000 < 2048); the 5000-token doc starts at 2100 -> seq 1
    val docs = Seq((1L, 1000L), (2L, 1000L), (3L, 100L), (4L, 5000L))
      .toDF("doc_id", "nt")
    val out = Pack.packSequences(docs, "doc_id", "nt", seqTokens = 2048L)
      .select("seq_id", "n_docs", "n_tokens").as[(Long, Long, Long)]
      .collect().toSet
    assert(out === Set((0L, 3L, 2100L), (1L, 1L, 5000L)))
  }

  test("packSequences is partitioning-independent") {
    val docs = spark.range(1, 501)
      .select(col("id").as("doc_id"), (col("id") % 97 + 1).as("nt"))
    val a = Pack.packSequences(docs.repartition(17), "doc_id", "nt", 256L, buckets = 5)
      .orderBy("seq_id").collect().toSeq
    val b = Pack.packSequences(docs.coalesce(1), "doc_id", "nt", 256L, buckets = 64)
      .orderBy("seq_id").collect().toSeq
    assert(a === b)
  }

  test("q_rollup: detail rows sum to subtotals and the grand total") {
    val out = graft.queries.TpchQueries.qRollup(spark, "/root/testdata/sf0.001")
    out.cache()
    try {
      val detailN = out.filter(col("gid") === 0).agg(sum("n")).head.getLong(0)
      val grandN = out.filter(col("gid") === 3).select("n").head.getLong(0)
      assert(detailN === grandN)
      val subN = out.filter(col("gid") === 1).agg(sum("n")).head.getLong(0)
      assert(subN === grandN)
    } finally out.unpersist()
  }
}
