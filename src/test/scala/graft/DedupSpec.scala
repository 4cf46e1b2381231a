package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 1
    (3L, "completely different content about spark shuffles and partitions here"),
    (4L, "THE QUICK BROWN FOX jumps over the lazy dog near the river bank today!"), // exact dup of 1 after normalize
    (5L, "tiny")).toDF("doc_id", "text")

  test("exactGroups groups normalized duplicates under one fingerprint") {
    val out = Dedup.exactGroups(corpus, "doc_id", "text")
      .select("n_docs", "keep_id").as[(Long, Long)].collect().toSet
    assert(out.contains((2L, 1L))) // docs 1+4 share a fingerprint, keep min id
    assert(out.count(_._1 == 1L) === 3)
  }

  test("jaccardPairs finds the near-dup pair and nothing else at 0.6") {
    val out = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccardPairs: empty corpus and single-doc corpus yield no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(empty, "doc_id", "text", 3, 0.5).count() === 0)
    val single = Seq((1L, "just one document here")).toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(single, "doc_id", "text", 3, 0.5).count() === 0)
  }

  test("jaccardPairs with a df cap still verifies on FULL shingle sets") {
    // docs 1 and 2 share many shingles; with maxDf=1 every shared
    // shingle is dropped from the index (df=2), so the pair cannot be
    // GENERATED — but any pair that does surface must carry the true
    // full-set Jaccard, and lowering the threshold must not resurrect
    // pairs whose every shared shingle is capped
    val capped = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
      threshold = 0.1, maxDf = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!capped.contains((1L, 2L)))
    // with a permissive cap the pair returns with its exact jaccard
    val loose = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
      threshold = 0.6, maxDf = 100)
      .select("a_id", "b_id", "jac").as[(Long, Long, Double)].collect()
    val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
      threshold = 0.6)
      .select("a_id", "b_id", "jac").as[(Long, Long, Double)].collect()
    assert(loose.sortBy(r => (r._1, r._2)).toSeq ===
      exact.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("jaccardPairsPrefix equals the full-index path across thresholds") {
    // recall is the property at stake: the prefix filter must never
    // drop a qualifying pair. Sweep thresholds so prefix lengths of
    // 1..several are exercised, on a corpus with exact dups, near-dups,
    // disjoint docs and a single-shingle doc.
    val docs = corpus.union(Seq(
      (6L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (7L, "alpha beta gamma"), // single shingle
      (8L, "alpha beta gamma")  // its exact dup
    ).toDF("doc_id", "text"))
    val hsh = Dedup.hashShingles(Dedup.shingles(docs, "doc_id", "text", 3))
    for (t <- Seq(0.5, 0.8, 0.95, 1.0)) {
      val full = Dedup.jaccardPairsFromHashes(hsh, t)
        .collect().map(_.toString).sorted.toSeq
      val pref = Dedup.jaccardPairsPrefix(hsh, t)
        .collect().map(_.toString).sorted.toSeq
      assert(pref === full, s"prefix path diverged at t=$t")
      // the shuffle-bytes-bound scale shape (light candidates + cached
      // verify) must produce the identical pair set
      val once = Dedup.jaccardPairsPrefixOnce(hsh, t)
        .collect().map(_.toString).sorted.toSeq
      assert(once === full, s"prefixOnce path diverged at t=$t")
      // the fused-expression headline path (SortedShingleHashes +
      // SortedIntersectCount) must also produce the identical pair set
      val fused = Dedup.jaccardPairsPrefixFromText(docs, "doc_id", "text", 3, t)
        .dropDuplicates()
        .collect().map(_.toString).sorted.toSeq
      assert(fused === full, s"fused prefix path diverged at t=$t")
    }
  }

  test("jaccardPairsPrefix: empty and single-doc corpora yield no pairs") {
    val empty = Dedup.hashShingles(Dedup.shingles(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 3))
    assert(Dedup.jaccardPairsPrefix(empty, 0.8).count() === 0)
    val one = Dedup.hashShingles(Dedup.shingles(
      Seq((1L, "just one document right here")).toDF("doc_id", "text"),
      "doc_id", "text", 3))
    assert(Dedup.jaccardPairsPrefix(one, 0.8).count() === 0)
  }

  test("simhashPairs ignores docs with no shingles (no all-ones pairing)") {
    val tiny = Seq(
      (1L, "a b"), (2L, "c d"), (3L, "e f"), // all shorter than n=3
      (4L, "the quick brown fox jumps high today")).toDF("doc_id", "text")
    assert(Dedup.simhashPairs(tiny, "doc_id", "text", n = 3, maxHamming = 7)
      .count() === 0)
  }

  test("minhashLshPairs recalls every exact-Jaccard pair on the testdata corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // verification on full sets makes LSH precision exact; recall is the
    // probabilistic part — these band settings must not miss 0.8+ pairs
    assert(lsh === exact)
    assert(exact.nonEmpty)
  }

  test("simhashPairs finds the near-dup pair within hamming 7") {
    val out = Dedup.simhashPairs(corpus, "doc_id", "text", n = 3, maxHamming = 7)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)) || out.contains((1L, 4L)))
  }

  test("embeddingPairs finds only pairs above the cosine threshold") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),  // cos ~ 0.994 with 1
      (3L, Array(0.0f, 1.0f, 0.0f))). // orthogonal to 1
      toDF("vec_id", "embedding")
    val out = Dedup.embeddingPairs(vecs, "vec_id", "embedding", 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("embeddingPairsLsh: subset of exact pairs, full recall on high-cos near-dups") {
    // 8-dim near-identical pairs (cos ~ 0.999) plus unrelated axes:
    // at the default (r=5 x 20 bands) the survival probability of a
    // 0.99+ pair is 1 - (1 - (1 - acos(.99)/pi)^5)^20 ~ 1 - 5e-15
    val vecs = Seq(
      (1L, Array(1.0f, 0.02f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(1.0f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Array(0f, 1.0f, 0.01f, 0f, 0f, 0f, 0f, 0f)),
      (4L, Array(0f, 1.0f, 0.02f, 0f, 0f, 0f, 0f, 0f)),
      (5L, Array(0f, 0f, 0f, 0f, 0f, 0f, 1.0f, 0f))).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingPairs(vecs, "vec_id", "embedding", 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingPairsLsh(vecs, "vec_id", "embedding",
      dim = 8, threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact === Set((1L, 2L), (3L, 4L)))
    assert(lsh.subsetOf(exact)) // exact verify: no false positives, ever
    assert(lsh === exact)       // deterministic hyperplanes: full recall here
  }

  test("embeddingPairsLsh: single-band configuration plans and runs") {
    // bands = 1 has no earlier band — the first-collision dedup
    // predicate must degrade to "emit always", not an empty reduce
    val vecs = Seq(
      (1L, Array(1.0f, 0.02f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(1.0f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f, 0f, 0f, 0f, 1.0f, 0f))).toDF("vec_id", "embedding")
    val lsh = Dedup.embeddingPairsLsh(vecs, "vec_id", "embedding",
      dim = 8, threshold = 0.9, nBits = 8, bands = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh === Set((1L, 2L)))
  }

  test("embeddingPairs refuses a corpus above maxRows at execution time") {
    val vecs = (1L to 10L).map(i => (i, Array(i.toFloat, 1f, 0f)))
      .toDF("vec_id", "embedding")
    // construction stays lazy (pure plan builder) — the guard fires at
    // the first action, before the quadratic product can run away
    val guarded = Dedup.embeddingPairs(vecs, "vec_id", "embedding", 0.0,
      maxRows = 5)
    val ex = intercept[Exception] { guarded.collect() }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain.contains("embeddingPairsLsh"), s"unexpected failure: $chain")
    // and the same corpus passes untouched under the bound
    assert(Dedup.embeddingPairs(vecs, "vec_id", "embedding", 0.999999,
      maxRows = 10).count() >= 0)
  }

  test("cap-collapse guards refuse corpora whose every bucket would cap") {
    // the sf10 rehearsal regression class: mean bucket occupancy past
    // maxBucket drops EVERY bucket and the pair output silently empties
    // — the operators now refuse at plan build when the caller passes
    // the corpus size (loud boundary, like the all-pairs maxRows guard)
    val vecs = (1L to 10L).map(i => (i, Array(i.toFloat, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val exL = intercept[IllegalArgumentException] {
      Dedup.embeddingPairsLsh(vecs, "vec_id", "embedding", dim = 3,
        threshold = 0.5, corpusRows = Some(200000L))
    }
    assert(exL.getMessage.contains("ZERO pairs"))
    val sh = (1L to 4L).map(i => (i, Seq(s"a$i b c", "b c d"), 2L))
      .toDF("__id", "sh", "sz")
    val exS = intercept[IllegalArgumentException] {
      Dedup.simhashPairsFromShingles(sh, maxHamming = 7,
        corpusRows = Some(500000L))
    }
    assert(exS.getMessage.contains("ZERO pairs"))
    // below the bound the armed guard is a no-op: same results as unarmed
    val armed = Dedup.simhashPairsFromShingles(sh, maxHamming = 7,
      corpusRows = Some(4L)).collect().toSet
    val unarmed = Dedup.simhashPairsFromShingles(sh, maxHamming = 7)
      .collect().toSet
    assert(armed == unarmed)
  }

  test("ddEmbeddingLsh audit column holds the measured recall floor") {
    val out = graft.queries.DedupQueries
      .ddEmbeddingLsh(spark, "/root/testdata/sf0.001")
      .select("recall").as[Double].collect()
    assert(out.nonEmpty)
    assert(out.distinct.length === 1) // constant audit column
    // measured floor: with deterministic hyperplanes the r=5 × 20-band
    // config recalls 7/7 = 1.0 here (pairs AT the 0.45 noise floor
    // stay deliberately lossy, see embeddingPairs scaladoc); a drop
    // below 0.85 means the signature/banding regressed
    assert(out.head >= 0.85, s"dd_embedding_lsh recall regressed: ${out.head}")
  }

  test("ddMinhashLsh audit column holds full recall on the planted pairs") {
    val out = graft.queries.DedupQueries
      .ddMinhashLsh(spark, "/root/testdata/sf0.001")
      .select("recall").as[Double].collect()
    assert(out.nonEmpty)
    assert(out.head >= 0.9, s"dd_minhash_lsh recall regressed: ${out.head}")
  }

  test("connectedComponents labels chains, triangles and singletons") {
    // component {1,2,3} as a CHAIN (1-2, 2-3: needs propagation across
    // 2 hops), triangle {5,6,7}, singleton 4
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("a_id", "b_id")
    val out = Dedup.connectedComponents(verts, "doc_id", pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("connectedComponents converges on a long chain within maxIter") {
    val n = 12
    val verts = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = Dedup.connectedComponents(verts, "doc_id", pairs, "a_id", "b_id",
      maxIter = 15).as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(1L))
  }

  test("jaccardPairsAcrossShingles reports only cross-corpus pairs") {
    // 1-2 near-dups split across batch/corpus -> reported;
    // 3-4 near-dups both in the corpus -> never scored
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven nine")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val out = Dedup.jaccardPairsAcrossShingles(
      sh.filter($"__id" === 1L), sh.filter($"__id" =!= 1L), threshold = 0.5)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("connectedComponents throws rather than returning unconverged labels") {
    val n = 10
    val verts = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a_id", "b_id")
    assertThrows[IllegalArgumentException] {
      Dedup.connectedComponents(verts, "doc_id", pairs, "a_id", "b_id",
        maxIter = 2).collect()
    }
  }

  // yesterday: clusters {1,2}, {5,6}, singleton 9 (labels = min ids)
  private def prevLabels =
    Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("id", "cluster_id")

  test("updateComponents merges a batch into touched clusters only") {
    // batch {10, 11}: 10 pairs with 2 (joins cluster 1), 11 is isolated
    val batch = Seq(10L, 11L).toDF("doc_id")
    val pairs = Seq((10L, 2L)).toDF("a_id", "b_id")
    val out = Dedup.updateComponents(prevLabels, "id", "cluster_id",
      batch, "doc_id", pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 11L,
      5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("updateComponents equals a full recompute over the union edge set") {
    // new pair 6-9 merges cluster {5,6} with singleton 9; new doc 0
    // pairs with 1 and drags cluster {1,2} down to label 0
    val batch = Seq(0L).toDF("doc_id")
    val pairs = Seq((6L, 9L), (0L, 1L)).toDF("a_id", "b_id")
    val incr = Dedup.updateComponents(prevLabels, "id", "cluster_id",
      batch, "doc_id", pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    val fullVerts = Seq(0L, 1L, 2L, 5L, 6L, 9L).toDF("doc_id")
    val fullPairs = Seq((1L, 2L), (5L, 6L), (6L, 9L), (0L, 1L))
      .toDF("a_id", "b_id")
    val full = Dedup.connectedComponents(fullVerts, "doc_id",
      fullPairs, "a_id", "b_id").as[(Long, Long)].collect().toMap
    assert(incr === full)
  }

  test("updateComponents re-converges only the touched region") {
    val pairs = Seq((10L, 2L)).toDF("a_id", "b_id")
    val touched = Dedup.touchedVertices(prevLabels, "id", "cluster_id",
      pairs, "a_id", "b_id").select("id").as[Long].collect().toSet
    // cluster {1,2} is touched (via vertex 2); {5,6} and 9 are not
    assert(touched === Set(1L, 2L))
  }

  test("ddKeepList: keeps the cluster min id, accounts dropped bytes, skips singletons") {
    val out = graft.queries.DedupQueries
      .ddKeepList(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty, "testdata plants near-dup clusters")
    out.foreach { r =>
      val (n, total, dropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 1, "singleton clusters have nothing to drop")
      assert(dropped > 0 && dropped < total,
        "kept doc's bytes stay; dropped strictly between 0 and total")
    }
    // keep ids are cluster minima -> strictly increasing in sorted output
    val keeps = out.map(_.getLong(0))
    assert(keeps.sameElements(keeps.sorted))
  }

  test("updateComponents with no new pairs appends singletons, labels untouched") {
    val batch = Seq(20L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val out = Dedup.updateComponents(prevLabels, "id", "cluster_id",
      batch, "doc_id", pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L,
      9L -> 9L, 20L -> 20L))
  }

  test("staged dedup lineage is keyed by dir and idempotent per dir") {
    // cache poisoning across SFs would make a same-session Verify at a
    // second dir silently return the first dir's clusters — pin the
    // isolation: each dir's labels cover exactly its own corpus, and
    // repeated invocations (memo hits) reproduce the first answer
    def clusterAt(dir: String) =
      graft.queries.DedupQueries.ddCluster(spark, dir)
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      val first = clusterAt(dir).collect()
      assert(first.length.toLong === docs,
        s"$dir: one label row per document of THIS dir")
      assert(clusterAt(dir).collect() === first,
        s"$dir: memo-hit invocation must reproduce the staged answer")
    }
  }
}
