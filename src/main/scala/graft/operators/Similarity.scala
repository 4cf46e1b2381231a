package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Scale design: the query set / centroid set is always the broadcast
  * side; the corpus is scanned once with vectors kept packed (zip_with +
  * aggregate dot products, no element explosion). Brute force is the
  * exact baseline; LSH and IVF bound the per-query candidate set so the
  * scan cost drops from N·Q to N + |candidates|.
  */
object Similarity {

  /** (id, emb:double[], nrm) projection with the cast and the norm each
    * computed once; downstream pair math uses the pre-cast fast paths. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
                       prefix: String): DataFrame =
    df.select(col(idCol).as(s"${prefix}id"), toDouble(col(vecCol)).as(s"${prefix}emb"))
      .withColumn(s"${prefix}nrm", normPre(col(s"${prefix}emb")))

  private def cosCol: Column =
    dotPre(col("qemb"), col("demb")) / (col("qnrm") * col("dnrm"))

  /** Per-query top-k by rounded cosine with deterministic id tie-break.
    * Rounding to 6 dp collapses summation-order ulps so ranks are
    * engine-stable; genuine ties fall back to vec_id order.
    *
    * Ranked through the top_k_pairs bounded-heap aggregate
    * (plans/TopKPairs): partial aggregation caps what leaves each map
    * partition at k pairs per query, where the equivalent
    * row_number() window would shuffle EVERY scored candidate to its
    * query's partition and sort there — |corpus|·|queries| rows vs
    * k·|queries|·mappers. Same output, including ties. */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("cos", round(cosCol, 6))
      .groupBy(col("qid").as("q_id"))
      .agg(call_function("top_k_pairs", col("cos"), col("did"), lit(k)).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("r0", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"), col("s.score").as("cos"),
        (col("r0") + 1).cast("long").as("rank"))

  /** Exact brute-force cosine top-k: broadcast the (small) query set,
    * one scan of the corpus, shuffle only (q_id, vec_id, cos) triples. */
  def bruteTopK(data: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int): DataFrame = {
    val d = withNorm(data, idCol, vecCol, "d")
    val q = withNorm(queries, idCol, vecCol, "q")
    topK(d.join(broadcast(q), col("did") =!= col("qid")), k)
  }

  /** Random-hyperplane LSH ANN top-k: nBits-bit signatures, split into
    * bands; a corpus vector is a candidate for a query iff they share at
    * least one band value. Approximate — recall grows with bands and
    * shrinks with rows-per-band (r = nBits/bands): collision prob for a
    * pair at angle θ is 1-(1-(1-θ/π)^r)^bands. Defaults r=3 × 10 bands:
    * on the synthetic corpus (isotropic noise — true top-10 cosines sit
    * at 0.27-0.40, barely above the 64-dim noise floor) this measures
    * recall@10 ≈ 0.87-0.95 (across plane seeds) at ~0.73 candidate
    * fraction; on a real corpus with actual near-duplicate structure
    * the same setting prunes far harder (a cos 0.9 pair collides w.p.
    * ~0.99996 while random pairs collide at 0.125/band). The old
    * r=4 × 4 default measured 0.43-0.49 recall — half the true
    * neighbors is not a usable brute-force replacement. */
  def lshTopK(data: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int,
              nBits: Int = 30, bands: Int = 10): DataFrame = {
    val d0 = withNorm(data, idCol, vecCol, "d")
    val q0 = withNorm(queries, idCol, vecCol, "q")
    // FUSED candidate generation + verification (r19, after the sf10
    // rehearsal): the corpus side streams its payload through the band
    // explode straight into the broadcast bucket probe, and the
    // first-collision predicate (the Dedup.embeddingPairsLsh
    // discipline, plans/FirstCollisionBand) makes every (query, doc)
    // candidate unique BY CONSTRUCTION — the old explode → join →
    // distinct() → re-join(d0) → re-join(q0) shape materialized a
    // partial-aggregate hash map over |Q|·N·collision-rate candidate
    // rows, which at sf10 (4k queries × 200k isotropic corpus ≈ 10^9
    // pre-distinct rows) OOM'd a 48 GB heap DURING its own spill
    // (UnsafeFixedWidthAggregationMap → sorter conversion). The fused
    // shape needs no aggregation and no corpus exchange at all: scan →
    // explode → broadcast probe → first-collision filter → cosine →
    // k-bounded topK partial agg. Candidate SET and therefore rows,
    // ranks and the recall audit are identical (SimilaritySpec pins
    // against brute force; the candidate-uniqueness proof is
    // FirstCollisionBand's).
    val cand = bandedVals(d0, "d", dim, nBits, bands,
        keep = Seq("demb", "dnrm"))
      .join(broadcast(bandedVals(q0, "q", dim, nBits, bands,
        keep = Seq("qemb", "qnrm"))), Seq("band", "v"))
      .filter(col("did") =!= col("qid") &&
        col("band") === graft.plans.FirstCollisionBand(
          col("dvals"), col("qvals"), lit(-1L)))
    topK(cand, k)
  }

  /** The LSH candidate-pair set (qid, did) alone — the stage whose
    * cardinality IS the honest cost of the index (candidate fraction =
    * |pairs| / (|Q|·(N-1))); exposed so audits can measure fraction
    * next to recall instead of inferring it (SURVEY §14's isotropic
    * 0.73 vs the clustered regime). Same plan [[lshTopK]] executes. */
  def lshCandidates(data: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, dim: Int,
                    nBits: Int = 30, bands: Int = 10): DataFrame =
    lshCandidateIds(withNorm(data, idCol, vecCol, "d"),
      withNorm(queries, idCol, vecCol, "q"), dim, nBits, bands)

  /** (id, vals, band, v) band rows for the bucket probe: `vals` is the
    * per-band value array (the signature's r-bit windows), carried so
    * the first-collision predicate can dedup candidates in-row, plus
    * any `keep` payload columns (the fused [[lshTopK]] carries the
    * corpus vector through — the probe side never shuffles, so payload
    * amplification is an in-codegen generate, not an exchange). */
  private def bandedVals(df: DataFrame, prefix: String, dim: Int,
                         nBits: Int, bands: Int,
                         keep: Seq[String]): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    require(bands <= 64, s"bands=$bands exceeds the 64-bit first-collision mask")
    val r = nBits / bands
    val mask = (1L << r) - 1
    val sig = hyperplaneSigPre(col(s"${prefix}emb"), nBits, dim)
    val vals = array((0 until bands).map { b =>
      shiftrightunsigned(sig, b * r).bitwiseAND(lit(mask))
    }: _*)
    df.withColumn(s"${prefix}vals", vals)
      .select(Seq(col(s"${prefix}id"), col(s"${prefix}vals")) ++ keep.map(col) :+
        posexplode(col(s"${prefix}vals")).as(Seq("band", "v")): _*)
  }

  private def lshCandidateIds(d0: DataFrame, q0: DataFrame, dim: Int,
                              nBits: Int, bands: Int): DataFrame =
    // first-collision dedup instead of a candidate distinct(): a pair
    // colliding in k bands surfaces only from its earliest agreeing
    // band, so each candidate is unique by construction and the
    // aggregation (whose hash map scaled with |Q|·N·collision-rate and
    // OOM'd the sf10 rehearsal) never exists — see [[lshTopK]]
    bandedVals(d0, "d", dim, nBits, bands, keep = Nil)
      .join(broadcast(bandedVals(q0, "q", dim, nBits, bands, keep = Nil)),
        Seq("band", "v"))
      .filter(col("did") =!= col("qid") &&
        col("band") === graft.plans.FirstCollisionBand(
          col("dvals"), col("qvals"), lit(-1L)))
      .select("qid", "did")

  /** Element-wise per-cluster mean over a `cluster` column, re-packed
    * as an array and ROUNDED to 6 dp: raw avg() merges partial sums in
    * shuffle-fetch order, and unrounded ulps can flip which centroids
    * a query probes between runs (the kmeansCentroids determinism fix;
    * one definition now serves both the trained quantizer and the
    * in-plan ivfTopK overload — r18 review finding). */
  private def clusterMean(d: DataFrame, vecCol: String,
                          out: String): DataFrame =
    d.select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cluster", "pos").agg(avg("x").as("m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => round(s.getField("m"), 6)).as(out))

  /** IVF-style ANN top-k: coarse centroids (mean vector per cluster
    * column), each query probes its nprobe nearest centroids, and only
    * those clusters' vectors are scanned. The cluster column plays the
    * coarse-quantizer role (at scale: a k-means assignment). */
  def ivfTopK(data: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, clusterCol: String, k: Int,
              nprobe: Int = 2): DataFrame = {
    val d = data.select(col(idCol).as("did"), toDouble(col(vecCol)).as("demb"),
      col(clusterCol).as("cluster"))
    val cent = clusterMean(d, "demb", "cemb")
    ivfTopKWithCentroids(data, queries, idCol, vecCol, clusterCol,
      cent, "cluster", "cemb", k, nprobe)
  }

  /** [[ivfTopK]] with the centroid table handed in — the SCALE shape:
    * on a real corpus the centroids come from a separate (sampled)
    * k-means job and are versioned alongside the cluster assignment,
    * not recomputed per query; the in-plan mean of the other overload
    * is the self-contained stand-in that reads the whole corpus once
    * just to rebuild them. `centroids` needs one row per cluster:
    * (centClusterCol, centVecCol: array<numeric>). Identical results
    * to the in-plan overload when the handed-in frame IS the
    * per-cluster mean (pinned by SimilaritySpec). Probe scoring,
    * candidate generation and the bounded-heap top-k are shared. */
  def ivfTopKWithCentroids(data: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, clusterCol: String,
                           centroids: DataFrame, centClusterCol: String,
                           centVecCol: String, k: Int,
                           nprobe: Int = 2): DataFrame = {
    val d = data.select(col(idCol).as("did"), toDouble(col(vecCol)).as("demb"),
      col(clusterCol).as("cluster"))
      .withColumn("dnrm", normPre(col("demb")))
    val cent = centroids.select(col(centClusterCol).as("cluster"),
      toDouble(col(centVecCol)).as("cemb"))
      .withColumn("cnrm", normPre(col("cemb")))
    val q = withNorm(queries, idCol, vecCol, "q")
    val probes = probeCells(q, cent, nprobe)
    val cand = d.join(broadcast(probes), Seq("cluster"))
      .filter(col("did") =!= col("qid"))
    topK(cand, k)
  }

  /** Which coarse cells each query probes — exposed as (qid, cluster)
    * so audits can weigh probed-cell mass (IVF's candidate fraction)
    * next to recall. [[probeCells]] is the exact stage
    * [[ivfTopKWithCentroids]] runs. */
  def ivfProbes(queries: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, centClusterCol: String,
                centVecCol: String, nprobe: Int): DataFrame = {
    val cent = centroids.select(col(centClusterCol).as("cluster"),
      toDouble(col(centVecCol)).as("cemb"))
      .withColumn("cnrm", normPre(col("cemb")))
    probeCells(withNorm(queries, idCol, vecCol, "q"), cent, nprobe)
      .select("qid", "cluster")
  }

  private def probeCells(q: DataFrame, cent: DataFrame,
                         nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy("qid").orderBy(
      (dotPre(col("qemb"), col("cemb")) / (col("qnrm") * col("cnrm"))).desc,
      col("cluster").asc)
    q.crossJoin(broadcast(cent))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select("qid", "qemb", "qnrm", "cluster")
  }

  /** Fold over a one-row centroid array picking the max-dot cluster —
    * the shuffle-free argmax behind both k-means training and corpus
    * assignment. `cents` is array<struct<cluster:long, cemb:array<double>>>
    * sorted by cluster id so strict-greater keeps the LOWEST cluster on
    * exact ties (deterministic across partitionings). Centroids are
    * unit-normalized, so argmax dot = argmax cosine for any input
    * vector without normalizing the corpus side. */
  private def bestCluster(v: Column, cents: Column): Column =
    aggregate(cents,
      struct(lit(Double.MinValue).as("s"), lit(-1L).as("c")),
      (acc, ct) => {
        val dp = dotPre(v, ct.getField("cemb"))
        when(dp > acc.getField("s"),
          struct(dp.as("s"), ct.getField("cluster").cast("long").as("c")))
          .otherwise(acc)
      },
      acc => acc.getField("c"))

  private def centArray(centroids: DataFrame): DataFrame =
    centroids.agg(sort_array(collect_list(
      struct(col("cluster"), col("cemb")))).as("__cents"))

  /** Deterministic spherical k-means coarse quantizer — the IVF index
    * build. Init = the `c` lowest-id vectors (cluster = id rank);
    * each Lloyd iteration assigns every vector to its max-cosine
    * centroid via [[bestCluster]] (ONE narrow pass per iteration — the
    * centroid table collapses to a single broadcast row, no shuffle on
    * the corpus side) and recomputes centroids as the unit-normalized
    * per-cluster mean of unit vectors, rounded to 6 dp so summation
    * order can never flip an assignment across partitionings. Fixed
    * iteration count (no data-dependent convergence probe) keeps the
    * build deterministic; per-iteration centroid frames are eagerly
    * localCheckpointed (c rows — O(iters) tiny jobs, O(1) lineage).
    *
    * Scale: at corpus scale this trains on a deterministic SAMPLE
    * (pass a sampled frame) and the one full-corpus pass is the final
    * assignment ([[ivfAssign]]) — the standard train-small/assign-once
    * IVF build. A cluster that empties mid-iteration drops out (c
    * shrinks), which the probe-side argmax handles transparently.
    *
    * Cluster labels are the seed vectors' OWN ids, not a 0..c-1 dense
    * rank: labels only need to be stable and unique (every consumer
    * keys or sorts by them), ids of the c lowest-id seeds are
    * order-isomorphic to the dense rank so all id-ordered tie-breaks
    * are unchanged, and the id avoids ranking the seed through an
    * unpartitioned window — bounded at c rows here, but the lint
    * banning single-task windows (RegistryPlanLintSpec) allows no
    * unannotated exceptions. */
  def kmeansCentroids(data: DataFrame, idCol: String, vecCol: String,
                      c: Int, iters: Int = 8): DataFrame = {
    require(c >= 1 && iters >= 0, s"need c>=1, iters>=0 (got $c, $iters)")
    val vn = data
      .select(col(idCol).as("__vid"), toDouble(col(vecCol)).as("__e"))
      .withColumn("__n", normPre(col("__e")))
      .filter(col("__n") > 0)
      .select(col("__vid"), transform(col("__e"), x => x / col("__n")).as("__u"))
    var cent = vn.orderBy("__vid").limit(c)
      .select(col("__vid").cast("long").as("cluster"), col("__u").as("cemb"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val asg = vn.crossJoin(broadcast(centArray(cent)))
        .select(col("__u"), bestCluster(col("__u"), col("__cents")).as("cluster"))
      cent = clusterMean(asg, "__u", "__r")
        .withColumn("cemb", transform(col("__r"), x => x / normPre(col("__r"))))
        .select("cluster", "cemb")
        .localCheckpoint()
    }
    cent
  }

  /** Assigns every corpus vector its coarse cell: one narrow pass with
    * the centroid set riding as a single broadcast row — the full-corpus
    * half of the IVF index build. Output = `data` + `cluster`. */
  def ivfAssign(data: DataFrame, vecCol: String,
                centroids: DataFrame): DataFrame =
    data.crossJoin(broadcast(centArray(centroids)))
      .withColumn("cluster",
        bestCluster(toDouble(col(vecCol)), col("__cents")))
      .drop("__cents")
}
