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
    // ANN: every returned neighbor must be a real vector pair. The
    // r=3 × 10-band default measures recall@10 0.87-0.95 across plane
    // seeds on the isotropic testdata (sf0.001/0.01/0.1 alike); floor
    // at 0.8 = min-seed measurement minus margin. The hard guarantee
    // is the planted-neighbor check below.
    val recall = lsh.keySet.count(brute.keySet.contains).toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall@10 regressed: $recall (measured 0.87-0.95)")
  }

  test("lshTopK never misses a planted high-cosine nearest neighbor") {
    // the testdata queries all have noise-floor rank-1s (max cos 0.43
    // at sf0.001), so the hard guarantee needs a corpus in the regime
    // LSH exists for: 64-dim vectors each with a cos ~0.999 twin. At
    // (nBits=30, bands=10, r=3) a twin's band-collision probability is
    // 1-(1-(1-acos(.999)/pi)^3)^10 ~ 1-3e-14, and the hyperplanes are
    // seeded — a missed twin means the signature/banding regressed.
    val rnd = new scala.util.Random(42)
    val base = (0 until 20).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val twins = base.map { case (i, v) =>
      (1000L + i, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val corpus = (base ++ twins).toDF("vec_id", "embedding")
    val qs = base.toDF("vec_id", "embedding")
    val top1 = Similarity.lshTopK(corpus, qs, "vec_id", "embedding",
      dim = 64, k = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    base.foreach { case (i, _) =>
      assert(top1.get(i).contains(1000L + i),
        s"LSH missed the planted twin of $i: got ${top1.get(i)}")
    }
  }

  test("ivfTopK with nprobe = all clusters equals brute force") {
    val ivf = ranks(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      clusterCol = "label", k = 10, nprobe = 10))
    val brute = ranks(Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 10))
    assert(ivf === brute)
  }

  test("ivfTopK with handed-in centroids equals the in-plan recompute") {
    import org.apache.spark.sql.functions._
    // the scale path: centroids arrive precomputed (k-means job output)
    // instead of being rebuilt from the corpus inside the query plan.
    // Handing in exactly the per-cluster mean must reproduce the
    // in-plan overload row for row — scores, ranks and tie-breaks.
    val cents = emb.select(col("label"),
        posexplode(graft.functions.VectorFunctions.toDouble(col("embedding")))
          .as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"))
      .groupBy("label")
      // 6-dp rounded like the operator's own clusterMean — the handed-in
      // frame must BE the per-cluster mean as the operator defines it
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => round(s.getField("m"), 6)).as("cvec"))
    for (np <- Seq(1, 2)) {
      val inPlan = ranks(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        clusterCol = "label", k = 5, nprobe = np))
      val handed = ranks(Similarity.ivfTopKWithCentroids(emb, queries,
        "vec_id", "embedding", "label", cents, "label", "cvec", k = 5,
        nprobe = np))
      assert(handed === inPlan, s"nprobe=$np diverged")
    }
  }

  test("kmeans IVF index: deterministic rebuild, recall@10 >= 0.75 at nprobe 6") {
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      c = 10, iters = 8)
    // deterministic: an independent rebuild lands on identical centroids
    // (6-dp-rounded means pin summation-order ulps)
    val snap = cents.orderBy("cluster").collect().map(_.toString).toSeq
    val snap2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      c = 10, iters = 8).orderBy("cluster").collect().map(_.toString).toSeq
    assert(snap === snap2)
    assert(snap.size === 10)
    // the k-means quantizer at nprobe 6/10 must keep recall a user
    // would accept (measured ~0.85 on this corpus; the label quantizer
    // it replaced measured 0.57 at nprobe 4 — neighbor-blind cells)
    val indexed = Similarity.ivfAssign(emb, "embedding", cents)
    val ivf = ranks(Similarity.ivfTopKWithCentroids(indexed, queries,
      "vec_id", "embedding", "cluster", cents, "cluster", "cemb",
      k = 10, nprobe = 6))
    val brute = ranks(Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 10))
    val recall = ivf.keySet.count(brute.keySet.contains).toDouble / brute.size
    assert(recall >= 0.75, s"IVF recall@10 regressed: $recall (measured ~0.85)")
  }
}
