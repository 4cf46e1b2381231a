package graft.operators

import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}
import graft.plans.SimHash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-pipeline corpora.
  *
  * Scale design (SURVEY §5): every near-dup variant generates candidate
  * pairs through an inverted index / LSH bucket SHUFFLE — never a global
  * all-pairs product — and verifies the exact metric only on candidates.
  * Bucket-size caps bound degenerate keys (a viral shingle, an all-zero
  * band) so no single task receives a quadratic bucket.
  */
object Dedup {

  /** Exact dedup groups: one row per content fingerprint with the doc
    * count and the canonical (minimum) id. Single hash shuffle on the
    * digest with map-side partial aggregation. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(idCol).as("keep_id"))

  /** Word-shingle sets with sizes: (id, sh, sz). The input is spread
    * across the cluster FIRST: a single-split source file would
    * otherwise run all tokenize/shingle/hash work on one core — the
    * narrow-row repartition is far cheaper than the serial scan. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleSets(df, idCol, textCol, n)

  private def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int) =
    Par.spread(df.select(col(idCol).as("__id"), col(textCol).as("__text")))
      .select(col("__id"), TextFunctions.shingleSet(col("__text"), n).as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))

  /** (__id, hs, sz) from a [[shingles]] frame — ONE xxhash64 pass over
    * the shingle strings. Every downstream consumer (inverted-index
    * joins, MinHash signatures, candidate verification) works on the
    * packed long arrays: stage this frame once and the string bytes
    * are never touched again. */
  def hashShingles(sh: DataFrame): DataFrame =
    sh.select(col("__id"), HashFunctions.shingleHashes(col("sh")).as("hs"),
      col("sz"))

  /** Verifies candidate (a_id, b_id) pairs with the Jaccard over the
    * full HASHED shingle sets — exact up to 64-bit collisions (see
    * [[jaccardPairsFromShingles]]). */
  private def verifyPairs(cand: DataFrame, hsh: DataFrame,
                          threshold: Double): DataFrame =
    cand
      .join(hsh.select(col("__id").as("a_id"), col("hs").as("hs_a"), col("sz").as("a_sz")), "a_id")
      .join(hsh.select(col("__id").as("b_id"), col("hs").as("hs_b"), col("sz").as("b_sz")), "b_id")
      .withColumn("shared", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("jac",
        col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "shared", "jac")

  /** Exact n-gram Jaccard pairs >= threshold via a shared-shingle
    * inverted index: explode distinct shingles, self-join on the shingle
    * (one hash shuffle), count shared shingles per pair, then Jaccard
    * from |A|+|B|-shared. Pairs sharing no shingle never materialize.
    *
    * maxDf drops shingles appearing in more than maxDf docs from the
    * INDEX — at corpus scale a stop-shingle otherwise creates a
    * quadratic bucket. With the cap active, the index only GENERATES
    * candidates (counting shared shingles there would undercount), and
    * each candidate is re-verified on its full shingle sets; pairs
    * whose every shared shingle is capped are missed by construction —
    * that is the documented recall trade of the cap. maxDf <= 0 is the
    * exact path. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double, maxDf: Long = 0): DataFrame =
    jaccardPairsFromShingles(shingleSets(df, idCol, textCol, n),
      threshold, maxDf)

  /** [[jaccardPairs]] over precomputed [[shingles]] — callers holding a
    * materialized shingle frame (e.g. a query plus its exact audit)
    * skip the tokenize+shingle pass entirely.
    *
    * The inverted-index join keys on xxhash64(shingle), not the shingle
    * string: the exchange carries fixed 8-byte longs instead of ~30-byte
    * UTF8 n-grams (the shuffle payload is the dominant cost of the
    * index join), and long equality beats string compare in the join
    * itself. Shared-shingle counts are exact up to 64-bit collisions —
    * two DIFFERENT shingles of the SAME candidate pair colliding, a
    * ~2^-64-per-pair event that standard shingle-hashing dedup
    * (Broder) accepts by construction. */
  def jaccardPairsFromShingles(sh: DataFrame, threshold: Double,
                               maxDf: Long = 0): DataFrame =
    jaccardPairsFromHashes(hashShingles(sh), threshold, maxDf)

  /** The inverted shingle index: one (doc, set-size, hashed-shingle)
    * row per shingle occurrence. Staged callers repartition this by
    * `sg` and checkpoint it ONCE — the checkpointed Dataset preserves
    * its hash partitioning, so every downstream pair join on `sg`
    * (self-join, incremental new-vs-old, candidate generation) runs
    * WITHOUT re-exchanging the index: the one artifact a dedup
    * pipeline shares across its whole query family. */
  def invertedIndex(hsh: DataFrame): DataFrame =
    hsh.select(col("__id"), col("sz"), explode(col("hs")).as("sg"))

  /** [[jaccardPairsFromShingles]] over a pre-hashed [[hashShingles]]
    * frame — callers that stage the hashed arrays skip the per-run
    * string hashing pass entirely. */
  def jaccardPairsFromHashes(hsh: DataFrame, threshold: Double,
                             maxDf: Long = 0): DataFrame = {
    val ex0 = invertedIndex(hsh)
    if (maxDf <= 0) jaccardPairsFromIndex(ex0, threshold)
    else {
      val dfCounts = ex0.groupBy("sg").agg(count(lit(1)).as("__df"))
      val ex = ex0.join(dfCounts.filter(col("__df") <= maxDf), "sg")
      val cand = ex.select(col("__id").as("a_id"), col("sg"))
        .join(ex.select(col("__id").as("b_id"), col("sg")), Seq("sg"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      verifyPairs(cand, hsh, threshold)
    }
  }

  /** The exact-Jaccard self-join over a (possibly pre-partitioned)
    * [[invertedIndex]] frame. The per-pair match count over ALL
    * shingles IS the intersection size — no second pass needed. The
    * size-ratio prefilter is lossless for the threshold: jac >= t
    * forces min(|A|,|B|) >= t * max(|A|,|B|) (shared <= min and
    * shared >= t/(1+t)*(|A|+|B|)), so mismatched-size pairs drop
    * BEFORE the aggregation instead of after. */
  def jaccardPairsFromIndex(idx: DataFrame, threshold: Double): DataFrame = {
    val a = idx.select(col("__id").as("a_id"), col("sz").as("a_sz"), col("sg"))
    val b = idx.select(col("__id").as("b_id"), col("sz").as("b_sz"), col("sg"))
    a.join(b, Seq("sg"))
      .filter(col("a_id") < col("b_id") &&
        col("a_sz") >= lit(threshold) * col("b_sz") &&
        col("b_sz") >= lit(threshold) * col("a_sz"))
      .groupBy("a_id", "b_id", "a_sz", "b_sz")
      .agg(count(lit(1)).as("shared"))
      .withColumn("jac",
        col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "shared", "jac")
  }

  /** Exact Jaccard pairs via PREFIX-FILTERED candidate generation
    * (the AllPairs prefix filter, Bayardo et al., WWW'07): under any
    * global total order on shingles — the xxhash64 value itself here —
    * a pair with jac >= t must share one of the FIRST
    * `|X| - ceil(t*|X|) + 1` elements of each of its sets. Proof
    * shape: jac >= t with the (lossless) size-ratio bound forces
    * overlap >= t*|X| for both sets, and the smallest SHARED element
    * sits at position <= |X| - overlap + 1 in each — inside both
    * prefixes. So indexing only the prefix (~(1-t) of each set; 20 %
    * at t=0.8) keeps EVERY qualifying pair while the candidate join's
    * output shrinks quadratically (~(1-t)^2 — measured 1.40 M -> 56 k
    * pair rows at sf0.1). Candidates are then verified EXACTLY on the
    * full hashed sets, so the result is identical to
    * [[jaccardPairsFromIndex]], row for row.
    *
    * Scale: the prefix index is the only exploded frame (25x smaller
    * than the full inverted index at t=0.8), the candidate set after
    * the prefix+size filters is near-linear in the true pair count,
    * and verification joins the tiny candidate list back to the
    * packed arrays — AQE broadcasts it at any realistic duplicate
    * rate. Stop-shingle caps are unnecessary: a shingle must be in a
    * set's rarest-(1-t) tail of the hash order to enter the index at
    * all, and the quadratic bucket risk moves from "most common
    * shingle" to "most common PREFIX shingle", 25x rarer. */
  def jaccardPairsPrefix(hsh: DataFrame, threshold: Double): DataFrame =
    jaccardPairsPrefixRaw(hsh, threshold).dropDuplicates()

  /** [[jaccardPairsPrefix]] WITHOUT the final dedup: one output row per
    * (qualifying pair, shared prefix shingle) — the full arrays ride
    * the candidate join so verification is computed in-row with no
    * join back to the corpus (a second scan+shingle derivation
    * otherwise). Rows for the same pair are identical, so callers
    * dedup with a plain distinct wherever their deliverable lives —
    * the small-deliverable queries fuse it into their one-partition
    * sort and finish with a single exchange. */
  /** AllPairs prefix index: the first sz − ceil(sz·t) + 1 entries of a
    * corpus-wide-consistently-sorted shingle array (greatest(1, ...)
    * keeps single-shingle docs indexed — their prefix IS the whole
    * set). ONE definition: this formula is the recall proof obligation
    * of every prefix-filtered jaccard variant; a change must not have
    * to find three copies (r18 review finding). */
  private def prefixExplode(threshold: Double): Column =
    explode(slice(col("hs"), lit(1), greatest(lit(1),
      (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")))).as("sg")

  def jaccardPairsPrefixRaw(hsh: DataFrame, threshold: Double): DataFrame = {
    // the global order must be consistent corpus-wide: sort each
    // packed array once and slice its head. greatest(1, ...) keeps
    // single-shingle docs indexed (their prefix IS the whole set).
    val pre = hsh
      .select(col("__id"), col("sz"), array_sort(col("hs")).as("hs"))
      .select(col("__id"), col("sz"), col("hs"),
        prefixExplode(threshold))
    val a = pre.select(col("__id").as("a_id"), col("sz").as("a_sz"),
      col("hs").as("hs_a"), col("sg")).hint("shuffle_hash")
    val b = pre.select(col("__id").as("b_id"), col("sz").as("b_sz"),
      col("hs").as("hs_b"), col("sg"))
    a.join(b, Seq("sg"))
      .filter(col("a_id") < col("b_id") &&
        col("a_sz") >= lit(threshold) * col("b_sz") &&
        col("b_sz") >= lit(threshold) * col("a_sz"))
      .withColumn("shared",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("jac",
        col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "shared", "jac")
  }

  /** [[jaccardPairsPrefixRaw]] straight from the documents frame, with
    * the whole per-doc chain — tokenize → shingle → string-dedup →
    * xxhash64 → sort — FUSED into one codegen expression per side
    * (plans.SortedShingleHashes): the unfused chain materializes the
    * string array, re-walks it to hash, then sorts through
    * `array_sort`, whose comparator lambda the engine evaluates
    * INTERPRETED per element pair; and because the self-join computes
    * its lineage on both sides, every per-pass saving lands twice.
    * Candidate verification walks the two sorted arrays with a merge
    * intersect (plans.SortedIntersectCount) instead of
    * array_intersect's per-pair hash set. Rows identical to
    * [[jaccardPairsPrefixRaw]] ∘ [[hashShingles]] ∘ [[shingles]]
    * (asserted in DedupSpec) up to the already-documented 64-bit
    * collision regime.
    *
    * The self-join consumes ONE shared exchange: both sides project
    * off the same `repartition(sg)` node, so AQE's stage reuse ships
    * the exploded prefix frame (and computes the fused chain) exactly
    * once — the raw two-sided shape pays both twice because its
    * per-side aliasing breaks exchange canonicalization. Verified at
    * runtime (ReusedExchange in the adaptive plan; DedupSpec pins row
    * identity). */
  /** Detects the corpus's STOP SHINGLES — the bounded hot list
    * [[jaccardPairsPrefixFromText]] excludes from prefixes — on a
    * deterministic 1-in-`sampleMod` document sample: shingles whose
    * sampled document frequency exceeds `floorMult`× the sampled mean,
    * hottest capped at `cap` entries, returned coldest-first (the
    * hot-segment order of the prefix proof; ties by hash). Accuracy
    * only affects PERFORMANCE — the prefix order stays exact for any
    * list — so a cheap sample suffices: a quadratic bucket is by
    * definition frequent enough to be sampled. On a uniform corpus no
    * shingle clears the floor and the list comes back empty (= the
    * unchanged fast plan). At 100 TB this list is a published corpus
    * artifact built by the same pipeline that owns the dedup index
    * (the ss_ivf_topk quantizer discipline); size it by a df floor,
    * which bounds every remaining bucket. */
  def hotShingles(df: DataFrame, idCol: String, textCol: String, n: Int,
                  sampleMod: Int = 10, floorMult: Double = 4.0,
                  cap: Int = 4096): Seq[Long] = {
    val sampled = df
      .filter(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
      .select(explode(coalesce(
        graft.plans.SortedShingleHashes(col(textCol), n),
        array().cast("array<long>"))).as("sg"))
    val dfc = sampled.groupBy("sg").agg(count(lit(1)).as("__df"))
    val meanDf = dfc.agg(avg("__df")).collect()(0).getDouble(0)
    if (meanDf.isNaN) return Nil
    val floor = floorMult * meanDf
    dfc.filter(col("__df") > floor)
      .orderBy(desc("__df"), col("sg")).limit(cap)
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity).map(_._2).toSeq
  }

  /** `selfJoinParts`: explicit partition count for the prefix
    * self-join's shared exchange. The join is shuffle_hash-hinted (the
    * measured win over sort-merge at bench scale) and an SHJ build
    * side cannot spill — the build rows carry the full packed shingle
    * arrays, so per-partition build bytes grow linearly with corpus
    * while the session's shuffle-partition constant does not: the sf10
    * rehearsal failed here with "Can't acquire … bytes to build hash
    * relation" at the default heap (guide §3.1's documented SHJ risk).
    * Callers above bench scale pass a corpus-derived count
    * (DedupQueries sizes it from the staged doc count) so build sides
    * stay bounded; None keeps the session default — the plan below the
    * threshold is byte-identical to r18. */
  def jaccardPairsPrefixFromText(df: DataFrame, idCol: String, textCol: String,
                                 n: Int, threshold: Double,
                                 hot: Seq[Long] = Nil,
                                 selfJoinParts: Option[Int] = None): DataFrame = {
    val hs = Par.spread(df.select(col(idCol).as("__id"), col(textCol).as("__text")))
      .select(col("__id"),
        coalesce(graft.plans.SortedShingleHashes(col("__text"), n),
          array().cast("array<long>")).as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
    // `hot` swaps the prefix's global order for stop-shingle-last
    // (plans.PrefixSkipHot): recall-identical by the AllPairs proof
    // (any corpus-consistent total order), but a corpus-hot shingle no
    // longer lands in every containing doc's prefix — the quadratic
    // bucket a zipf corpus otherwise sends the candidate join
    // (measured: 4.1M -> ~60 candidate rows on the zipf sf1 clone).
    // Empty list keeps the plan literally unchanged.
    val prefixCol =
      if (hot.isEmpty) prefixExplode(threshold)
      else explode(graft.plans.PrefixSkipHot(col("hs"),
        greatest(lit(1),
          (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")),
        hot)).as("sg")
    val pre = hs.select(col("__id"), col("sz"), col("hs"), prefixCol)
    val ex = selfJoinParts match {
      case Some(p) => pre.repartition(p, col("sg"))
      case None => pre.repartition(col("sg"))
    }
    val a = ex.select(col("__id").as("a_id"), col("sz").as("a_sz"),
      col("hs").as("hs_a"), col("sg")).hint("shuffle_hash")
    val b = ex.select(col("__id").as("b_id"), col("sz").as("b_sz"),
      col("hs").as("hs_b"), col("sg"))
    a.join(b, Seq("sg"))
      .filter(col("a_id") < col("b_id") &&
        col("a_sz") >= lit(threshold) * col("b_sz") &&
        col("b_sz") >= lit(threshold) * col("a_sz"))
      .withColumn("shared",
        graft.plans.SortedIntersectCount(col("hs_a"), col("hs_b")))
      .withColumn("jac",
        col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "shared", "jac")
  }

  /** [[jaccardPairsPrefix]] with the sorted-hash frame materialized
    * ONCE inside the query (a lazy in-query localCheckpoint, so every
    * run still pays for its own shingle/hash/sort work — this is not
    * cross-run staging): the candidate join carries only
    * (id, sz, sg) 24-byte rows instead of the packed arrays, and the
    * deduped candidate pairs verify by joining BACK to the cached
    * arrays — tiny after the prefix+size filters, so AQE converts
    * both verify probes to broadcasts at runtime. Same rows as
    * [[jaccardPairsFromIndex]].
    *
    * Versus [[jaccardPairsPrefixRaw]]: the raw variant streams the
    * full arrays through both join shuffles (~25x the bytes, and the
    * shingle chain computes twice — exchange reuse does not fire
    * across the two sides), but needs ~4 fewer stages. At sf0.1 the
    * stage-count floor wins (raw ~0.8 s vs ~2.0 s here), so the
    * headline query keeps raw; this is the shuffle-bytes-bound shape
    * for corpora where the packed arrays dwarf the candidate set. */
  def jaccardPairsPrefixOnce(hsh: DataFrame, threshold: Double): DataFrame = {
    val hs = hsh.select(col("__id"), col("sz"), array_sort(col("hs")).as("hs"))
      .localCheckpoint(false)
    val pre = hs.select(col("__id"), col("sz"),
      prefixExplode(threshold))
    val cand = pre.select(col("__id").as("a_id"), col("sz").as("a_sz"), col("sg"))
      .hint("shuffle_hash")
      .join(pre.select(col("__id").as("b_id"), col("sz").as("b_sz"), col("sg")),
        Seq("sg"))
      .filter(col("a_id") < col("b_id") &&
        col("a_sz") >= lit(threshold) * col("b_sz") &&
        col("b_sz") >= lit(threshold) * col("a_sz"))
      .select("a_id", "b_id").distinct()
    verifyPairs(cand, hs, threshold)
  }

  /** [[jaccardPairsAcrossHashes]] over (possibly pre-partitioned)
    * [[invertedIndex]] frames — the incremental shape reading the
    * staged index: only (new, old) pairs sharing a shingle
    * materialize, and a co-partitioned index joins with no
    * exchange. */
  def jaccardPairsAcrossIndex(idxNew: DataFrame, idxOld: DataFrame,
                              threshold: Double): DataFrame = {
    // build side = the BATCH index (bounded by the ingest window),
    // probe side = the corpus. shuffle_hash instead of the planner's
    // stat-blind pick: no sort of the corpus side, no driver-side
    // broadcast collect, and a co-partitioned staged index joins with
    // zero exchange; the per-partition hash map is batch-sized.
    val a = idxNew.select(col("__id").as("new_id"), col("sz").as("a_sz"), col("sg"))
      .hint("shuffle_hash")
    val b = idxOld.select(col("__id").as("old_id"), col("sz").as("b_sz"), col("sg"))
    a.join(b, Seq("sg"))
      .filter(col("a_sz") >= lit(threshold) * col("b_sz") &&
        col("b_sz") >= lit(threshold) * col("a_sz"))
      .groupBy("new_id", "old_id", "a_sz", "b_sz")
      .agg(count(lit(1)).as("shared"))
      .withColumn("jac",
        col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
      .filter(col("jac") >= threshold)
      .select("new_id", "old_id", "shared", "jac")
  }

  /** Cross-corpus exact Jaccard pairs: each LEFT (new-batch) doc
    * against the RIGHT (historical) corpus through the same
    * inverted-shingle index — the INCREMENTAL dedup shape. A daily
    * batch arriving on a 100 TB corpus must never rescore
    * old-vs-old pairs; here only (new, old) pairs sharing a shingle
    * materialize, so the per-batch cost is proportional to the batch,
    * not the corpus square. Same lossless size-ratio prefilter as the
    * self-join variant. */
  def jaccardPairsAcrossShingles(shNew: DataFrame, shOld: DataFrame,
                                 threshold: Double): DataFrame =
    jaccardPairsAcrossHashes(hashShingles(shNew), hashShingles(shOld),
      threshold)

  /** [[jaccardPairsAcrossShingles]] over pre-hashed [[hashShingles]]
    * frames: the exchange carries fixed 8-byte longs instead of
    * ~30-byte UTF8 n-grams, and staged callers skip the string-hash
    * pass per run. */
  def jaccardPairsAcrossHashes(hNew: DataFrame, hOld: DataFrame,
                               threshold: Double): DataFrame =
    jaccardPairsAcrossIndex(invertedIndex(hNew), invertedIndex(hOld),
      threshold)

  /** MinHash + LSH near-dup pairs: k-hash signatures, b bands; docs
    * sharing any band bucket become candidates (buckets larger than
    * maxBucket are dropped — degenerate-key guard); candidates are then
    * verified with the EXACT Jaccard on their full shingle sets. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int, bands: Int, threshold: Double,
                      maxBucket: Long = 1000): DataFrame =
    minhashLshPairsFromShingles(shingleSets(df, idCol, textCol, n),
      k, bands, threshold, maxBucket)

  /** [[minhashLshPairs]] over precomputed [[shingles]]. */
  def minhashLshPairsFromShingles(sh0: DataFrame, k: Int, bands: Int,
                                  threshold: Double,
                                  maxBucket: Long = 1000): DataFrame =
    minhashLshPairsFromHashes(hashShingles(sh0), k, bands, threshold,
      maxBucket)

  /** [[minhashLshPairs]] over a pre-hashed [[hashShingles]] frame: the
    * string bytes were hashed exactly once at staging; the k
    * permutations re-hash the longs, and candidate verification runs
    * on the hashed sets. */
  def minhashLshPairsFromHashes(hsh0: DataFrame, k: Int, bands: Int,
                                threshold: Double,
                                maxBucket: Long = 1000): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val hsh = hsh0.filter(col("sz") > 0)
    val sig = hsh.select(col("__id"),
      HashFunctions.minhashFromHashes(col("hs"), k).as("sig"))
    val bandDf = sig
      .select(col("__id"),
        explode(HashFunctions.bandHashes(col("sig"), bands, k / bands)).as("bh"))
      .select(col("__id"), col("bh.band").as("band"), col("bh.h").as("h"))
    // bucket-size guard via a window over the SAME (band, h) partitioning
    // the pair join shuffles on — no extra groupBy+join recompute branch
    val sizeW = Window.partitionBy("band", "h")
    val bounded = bandDf
      .withColumn("__bn", count(lit(1)).over(sizeW))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    val cand = bounded.select(col("band"), col("h"), col("__id").as("a_id"))
      .join(bounded.select(col("band"), col("h"), col("__id").as("b_id")),
        Seq("band", "h"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    verifyPairs(cand, hsh, threshold)
  }

  /** SimHash near-dup pairs at Hamming distance <= maxHamming (<= 7):
    * 8-bit chunk join is an exact candidate generator by pigeonhole
    * (ham <= 7 implies at least one equal chunk of 8), then the true
    * Hamming distance filters candidates.
    *
    * Docs with no shingles are excluded (an empty feature set would
    * hash to the all-ones signature and pair contentless docs with each
    * other); buckets above maxBucket are dropped — the degenerate-key
    * guard that keeps any single chunk value from going quadratic. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, maxHamming: Int, maxBucket: Long = 1000): DataFrame =
    simhashPairsFromShingles(shingleSets(df, idCol, textCol, n),
      maxHamming, maxBucket)

  /** [[simhashPairs]] over precomputed [[shingles]].
    *
    * `corpusRows` (when the caller knows it — DedupQueries passes its
    * staged doc count) arms the CAP-COLLAPSE guard: the 8-bit pigeonhole
    * buckets average corpus/256 docs, so past maxBucket·256 rows the
    * degenerate-bucket cap drops EVERY bucket and the candidate set —
    * and the query output — silently empties (the sf10 rehearsal: 500k
    * docs → mean occupancy ~1950 > 1000 → 0 rows, 0 recall, no error).
    * A silent "no duplicates" at scale is corrupt output, so like
    * [[embeddingPairs]]'s all-pairs bound this refuses loudly with the
    * resize rule instead: raise maxBucket (per-bucket verify work grows
    * with its square), shard the corpus, or move to the permuted-prefix
    * table design (wider chunks per table, ham budget split across
    * tables) whose bucket width scales with log N. */
  def simhashPairsFromShingles(sh: DataFrame, maxHamming: Int,
                               maxBucket: Long = 1000,
                               corpusRows: Option[Long] = None): DataFrame = {
    require(maxHamming <= 7, "8-chunk pigeonhole is only exact for ham <= 7")
    corpusRows.foreach { n =>
      require(n <= maxBucket * 256,
        s"simhashPairs: $n docs put ~${n / 256} docs in every 8-bit chunk " +
          s"bucket (cap $maxBucket) — the degenerate-bucket guard would drop " +
          "every bucket and silently return ZERO pairs; raise maxBucket, " +
          "shard the corpus, or use permuted-prefix tables sized to log N")
    }
    val sig = sh.filter(col("sz") > 0)
      .select(col("__id"), SimHash64(col("sh")).as("sig"))
    val chunks = sig.select(col("__id"), col("sig"),
      explode(HashFunctions.simhashChunks(col("sig"))).as("c"))
      .select(col("__id"), col("sig"), col("c.chunk").as("chunk"), col("c.v").as("v"))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("chunk", "v")))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    chunks.select(col("chunk"), col("v"), col("__id").as("a_id"), col("sig").as("a_sig"))
      .join(chunks.select(col("chunk"), col("v"), col("__id").as("b_id"), col("sig").as("b_sig")),
        Seq("chunk", "v"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sig", "b_sig").distinct()
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Exact embedding-cosine pairs >= threshold. This is the CORRECTNESS
    * BASELINE: an all-pairs product (norms precomputed once, one dot
    * product per pair). At corpus scale, candidate pruning must come
    * from LSH bucketing ([[embeddingPairsLsh]]) — exact all-pairs is
    * quadratic by definition and only appropriate for bounded slices
    * (a shard, a bucket, an oracle check).
    *
    * Why the REGISTERED dd_embedding stays on this baseline: its 0.45
    * threshold sits inside the random-pair cosine noise floor of the
    * 64-dim synthetic embeddings (measured: non-pair cosines reach
    * 0.4497, threshold pairs start at 0.4501). At that separation any
    * hyperplane-LSH (r, b) with near-1 recall yields band buckets whose
    * pair product exceeds the all-pairs square itself — bucketing
    * cannot bound candidates AND keep the oracle-exact output. The LSH
    * route is registered alongside as dd_embedding_lsh with a
    * self-auditing recall column instead. */
  /** [[embeddingPairs]]'s all-pairs refusal bound — public so audit
    * machinery sizing a sampled base (DedupQueries.embExactPairs) uses
    * the same constant the guard enforces. */
  val EmbeddingPairsMaxRows: Long = 100000

  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double,
                     maxRows: Long = EmbeddingPairsMaxRows): DataFrame = {
    val e = df.select(col(idCol).as("__id"),
      VectorFunctions.toDouble(col(vecCol)).as("emb"))
      .withColumn("nrm", VectorFunctions.normPre(col("emb")))
      // zero-norm guard: a contentless (all-zero) embedding gives
      // cos = 0/0 = NaN, and Spark orders NaN LARGEST, so NaN >=
      // threshold is TRUE — every pair touching the zero vector would
      // pass as a spurious "duplicate" (the text operators' sz > 0
      // guard, same failure mode)
      .filter(col("nrm") > 0)
    // Corpus-size guard: the quadratic baseline REFUSES unbounded input
    // at execution time instead of silently planning a corpus-square
    // product (at 100x scale that is 10,000x the work — use
    // [[embeddingPairsLsh]] there). The guard is lazy — a 1-row count
    // aggregate whose assert_true fires on the first action — so
    // registry functions remain pure plan builders; its linear extra
    // scan is noise next to the O(n^2) product it protects.
    val guard = e.groupBy().agg(count(lit(1)).as("__n"))
      .select(assert_true(col("__n") <= maxRows, concat(
        lit("embeddingPairs is the exact all-pairs O(n^2) baseline and refuses corpora above maxRows="),
        lit(maxRows), lit(" (got "), col("__n"),
        lit(" rows); use Dedup.embeddingPairsLsh for unbounded input"))).as("__guard"))
    // spread the streamed side before the quadratic product — a
    // single-split source would otherwise run every pair on one core
    val a = Par.spread(
      e.select(col("__id").as("a_id"), col("emb").as("ea"), col("nrm").as("na")))
      // the filter keeps __guard referenced so pruning can't drop the
      // assert; assert_true yields NULL when the bound holds, so the
      // predicate keeps every row
      .crossJoin(broadcast(guard)).filter(col("__guard").isNull).drop("__guard")
    val b = e.select(col("__id").as("b_id"), col("emb").as("eb"), col("nrm").as("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", VectorFunctions.dotPre(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
  }

  /** LSH-candidate embedding near-dup pairs: fixed seeded
    * random-hyperplane signatures, banded bucket self-join (band rows
    * carry ids only — vectors rejoin after the id-level distinct, so
    * the candidate dedup never shuffles embedding payloads), the
    * degenerate-bucket cap, then EXACT cosine verification of every
    * candidate — output pairs are never false positives.
    *
    * This is the 100 TB route: pairs sharing no band bucket never
    * materialize, so the join is bounded by bucket occupancy instead of
    * the corpus square. The price is recall at the threshold: a pair at
    * cosine c becomes a candidate with
    * p(c) = 1 - (1 - (1 - acos(c)/pi)^r)^b, r = nBits/bands — ~1 for
    * genuine near-dups (c >= ~0.9 at the defaults) and deliberately
    * lossy near the noise floor (see [[embeddingPairs]] for why that is
    * unavoidable). The 100-plane default (r = 5 × 20 bands) measures
    * recall 0.92-1.0 across plane seeds at the 0.45 noise-floor
    * threshold, and its 2^5 = 32 values/band keep average bucket
    * occupancy under maxBucket through ~30k vectors — the r12 packed
    * 48-bit form (r = 4, 16 values/band) blew every bucket past the
    * cap at 20k vectors and recall collapsed to 0.23. Sizing rule at
    * real scale: 2^r ≳ N/maxBucket (r grows with log N), bands then
    * sized for recall at the target threshold. Callers that need the
    * recall actually achieved
    * should compare against the exact baseline on a sample —
    * DedupQueries.ddEmbeddingLsh emits exactly that audit column. */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double,
                        nBits: Int = 100, bands: Int = 20,
                        maxBucket: Long = 1000,
                        corpusRows: Option[Long] = None): DataFrame = {
    require(nBits % bands == 0, s"bands=$bands must divide nBits=$nBits")
    val r = nBits / bands
    require(r <= 63, s"rows-per-band $r exceeds one long")
    // CAP-COLLAPSE guard (see simhashPairsFromShingles): mean band-bucket
    // occupancy is corpus/2^r, so past maxBucket·2^r rows the
    // degenerate-bucket cap drops every bucket and the output silently
    // empties (sf10 rehearsal: 200k vectors at r=5 → occupancy 6250 >
    // 1000 → 0 rows, 0 recall, no error). The documented sizing rule —
    // 2^r ≳ N/maxBucket, bands then re-sized for recall at the target
    // threshold — is now enforced loudly instead of advisory.
    corpusRows.foreach { n =>
      // overflow-safe spelling of n <= maxBucket * 2^r: the shifted
      // product overflows Long at r >= 54 (default maxBucket=1000) and
      // the guard would spuriously refuse/accept exotic-but-legal
      // configs (r is only bounded <= 63); comparing n >> r against
      // maxBucket never overflows (r19 advice)
      require((n >> r) <= maxBucket,
        s"embeddingPairsLsh: $n vectors put ~${n >> r} in every " +
          s"$r-bit band bucket (cap $maxBucket) — the degenerate-bucket " +
          "guard would drop every bucket and silently return ZERO pairs; " +
          "re-size the signature (2^r >= corpus/maxBucket, bands re-sized " +
          "for recall at the threshold) or shard the corpus")
    }
    // the survived-band okMask (shiftleft(1L, band)) and
    // FirstCollisionBand's (mask >>> j) index single-long bit
    // positions — band indexes past 63 would silently wrap modulo 64
    // and drop/duplicate candidate pairs
    require(bands <= 64, s"bands=$bands exceeds the 64-bit band mask")
    val e = df.select(col(idCol).as("__id"),
      VectorFunctions.toDouble(col(vecCol)).as("emb"))
      .withColumn("nrm", VectorFunctions.normPre(col("emb")))
      // zero-norm guard: see embeddingPairs — all-zero vectors share
      // the all-ones hyperplane signature (s >= 0 sets every bit), so
      // they'd bucket together in EVERY band and then "verify" with
      // cos = NaN >= threshold
      .filter(col("nrm") > 0)
    // per-band values computed DIRECTLY over the band's global plane
    // window (no ≤63-bit packed-signature ceiling — the r12 48-bit
    // form capped the whole scheme at 16 values/band, and at 20k+
    // vectors every bucket blew past maxBucket and recall collapsed
    // to 0.23; 2^r must scale with corpus/maxBucket, which forces
    // total plane counts past one long)
    val vals = array((0 until bands).map { b =>
      VectorFunctions.hyperplaneSigPreAt(col("emb"), b * r, r, dim)
    }: _*)
    val banded = Par.spread(e.select(col("__id"), col("emb")))
      .withColumn("vals", vals)
      .select(col("__id"), col("vals"),
        posexplode(col("vals")).as(Seq("band", "v")))
    // per-row bucket survival + per-DOC survived-band bitmask: bit b of
    // okMask says "this doc's band-b bucket was not degenerate-capped".
    // The mask rides the bucket join so the first-collision predicate
    // below can skip capped bands — one extra narrow window shuffle on
    // __id (id, vals, band, v — no embedding payloads).
    val counted = banded
      .withColumn("__ok", count(lit(1)).over(Window.partitionBy("band", "v")) <= maxBucket)
    val bounded = counted
      .withColumn("okMask",
        sum(when(col("__ok"), expr("shiftleft(1L, cast(band as int))"))
          .otherwise(lit(0L))).over(Window.partitionBy("__id")))
      .filter(col("__ok"))
      .drop("__ok")
    // FIRST-COLLISION dedup instead of a global distinct: a pair
    // colliding in k bands would surface k times from the bucket join;
    // emitting it only from the EARLIEST band that (a) has agreeing
    // values and (b) SURVIVED the bucket cap makes every candidate
    // unique by construction — the candidate-set shuffle that a
    // distinct would cost simply never exists. The survived bit
    // matters: without it, a pair whose earliest agreeing band was
    // degenerate-capped would be dropped outright instead of
    // re-emitted by a later surviving band — a recall hole the cap was
    // never meant to open. Agreeing values put both docs in the SAME
    // bucket, so one side's mask bit decides. The whole check is ONE
    // codegen call (plans/FirstCollisionBand — earliest agreeing
    // surviving band) compared to the joined band: the equivalent
    // bands-1-disjunct Boolean tree, each term probing both value
    // arrays, cost ~7 s interpreted over the ~10^6 matched bucket rows
    // this join produces at a noise-floor threshold.
    val cand = bounded.select(col("band"), col("v"), col("__id").as("a_id"),
        col("vals").as("a_vals"), col("okMask").as("a_mask"))
      .join(bounded.select(col("band"), col("v"), col("__id").as("b_id"),
        col("vals").as("b_vals")), Seq("band", "v"))
      .filter(col("a_id") < col("b_id") &&
        col("band") === graft.plans.FirstCollisionBand(
          col("a_vals"), col("b_vals"), col("a_mask")))
      .select("a_id", "b_id")
    cand
      .join(e.select(col("__id").as("a_id"), col("emb").as("ea"), col("nrm").as("na")), "a_id")
      .join(e.select(col("__id").as("b_id"), col("emb").as("eb"), col("nrm").as("nb")), "b_id")
      .withColumn("cos", VectorFunctions.dotPre(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
  }

  /** Connected components over the near-dup pair graph: assigns every
    * vertex the MINIMUM id reachable from it, i.e. the canonical
    * representative of its duplicate cluster — the step that turns
    * pairwise near-dup output into "keep one doc per cluster".
    *
    * Distributed min-label propagation — but ONLY over PAIR ENDPOINTS.
    * A vertex with no edge can never change label, and in a dedup graph
    * the endpoints are a vanishing fraction of the corpus (most docs
    * are not near-duplicates of anything), so shuffling every vertex
    * through every round would spend the whole loop re-asserting
    * label = id for singletons. The loop converges over the endpoint
    * set; singletons rejoin with label = id through one final narrow
    * left join.
    *
    * Each round every endpoint takes the min of its own label and its
    * neighbors' labels (one hash shuffle on vertex id per round), until
    * a round changes nothing. Labels are localCheckpoint'ed per round —
    * without lineage truncation an iterative DataFrame loop re-executes
    * every prior round per action, turning O(rounds) into O(rounds²).
    * Checkpoints are LAZY and each round's convergence probe is the
    * action that materializes them: one Spark job per round, not two.
    *
    * Rounds needed = the graph diameter. Near-dup clusters are
    * quasi-cliques (every member pairs with most others — that is what
    * "near-duplicate" means), so the diameter is 1-3 hops and this
    * converges in 2-4 rounds of narrow (id, label) shuffles regardless
    * of corpus size; the star-contraction family (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) drops the
    * bound to O(log n) rounds but rewrites the EDGE set (wider shuffles
    * per round) — the wrong trade for flat dedup graphs. maxIter guards
    * the pathological chain case; non-convergence throws rather than
    * returning silently-wrong upper-approximation labels. */
  def connectedComponents(vertices: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    // the convergence probe's decimal label-sum needs NUMERIC ids: a
    // string id would crash its cast mid-loop under ANSI or (ANSI off)
    // null the sum and fake round-1 convergence — fail LOUDLY at plan
    // build instead, per this operator's throw-don't-be-wrong contract
    require(vertices.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"connectedComponents needs a numeric id column; '$idCol' is " +
        s"${vertices.schema(idCol).dataType.simpleString} — hash or rank " +
        "string ids to longs first (RankOps.withGlobalRank)")
    // the edge set is checkpointed PRE-PARTITIONED on src: every round
    // joins labels (already id-partitioned by the previous round's
    // groupBy) against it, so after the one staging shuffle no round
    // ever re-exchanges an edge — at corpus scale the edge set is the
    // wide side of the loop
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("src"))
      .localCheckpoint(eager = false)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(eager = false)
    // convergence probe: labels only ever DECREASE, so the label sum
    // strictly decreases iff any vertex changed — one overflow-safe
    // decimal agg over the checkpointed set instead of a per-round
    // labels⋈labels comparison join. Running the probe is ALSO what
    // materializes the round's lazy checkpoint.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // sum over zero rows is NULL — normalize so an empty edge set
      // converges instead of NPEing on the compare
      val d = df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
        .union(labels)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(eager = false)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds the near-dup quasi-clique assumption")
    // singletons (no edge) pass through with label = id — they never
    // entered the loop
    vertices.select(col(idCol).as("id"))
      .join(labels.select(col("id").as("__eid"), col("label")),
        col("id") === col("__eid"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster_id"))
  }

  /** Members of yesterday's clusters that today's pairs touch: every
    * vertex of any prev cluster containing an endpoint of `newPairs`.
    * Exposed separately because it IS the incremental-maintenance
    * contract — [[updateComponents]] re-converges exactly these plus
    * the new batch, never the whole graph. */
  def touchedVertices(prevLabels: DataFrame, idCol: String, labelCol: String,
                      newPairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val prev = prevLabels.select(col(idCol).as("id"), col(labelCol).as("label"))
    val endpoints = newPairs.select(col(aCol).as("id"))
      .union(newPairs.select(col(bCol).as("id"))).distinct()
    val touchedRoots = prev.join(endpoints, Seq("id"))
      .select(col("label")).distinct()
    prev.join(touchedRoots, Seq("label")).select("id", "label")
  }

  /** INCREMENTAL connected-component maintenance: merges today's pair
    * batch into yesterday's labels without re-converging the whole
    * graph. At corpus scale a daily batch touches a vanishing fraction
    * of clusters — relabeling 100 TB of stable docs because 0.1% got
    * new edges is the difference between a nightly job and a weekly
    * one.
    *
    * Shape: (1) every new-pair endpoint is PROJECTED onto its prior
    * cluster label (batch docs onto themselves) — the touched region
    * CONTRACTS to one node per prior cluster plus the batch docs
    * (Kiveris et al.'s star contraction, applied once: the stars are
    * already known, they are yesterday's converged clusters); (2) the
    * min-label loop ([[connectedComponents]]) re-converges that
    * contracted graph — rounds ∝ the diameter of the CLUSTER graph,
    * with whole prior clusters collapsed to single hops; (3) members
    * inherit their root's new label through one narrow join, batch
    * docs read theirs directly, untouched clusters pass through
    * label-identical and never enter the loop. Old labels are min
    * member ids, so the contracted minimum equals the minimum over
    * all member ids — exactly the labels a full recompute over the
    * union edge set would assign, the property the dd_cluster_incr
    * oracle hash-verifies.
    *
    * @param newVertices today's batch vertex universe (ids unseen by
    *        `prevLabels`; known ids are ignored — their cluster
    *        membership only changes if a new PAIR touches it)
    */
  def updateComponents(prevLabels: DataFrame, idCol: String, labelCol: String,
                       newVertices: DataFrame, newIdCol: String,
                       newPairs: DataFrame, aCol: String, bCol: String,
                       maxIter: Int = 25): DataFrame = {
    val prev = prevLabels.select(col(idCol).as("id"), col(labelCol).as("label"))
    // lazy checkpoints: both frames feed multiple branches below (the
    // edge projection, the contracted vertex set, the untouched
    // anti-join); the first action materializes them once, and build
    // time runs no jobs
    val pairs = newPairs.select(col(aCol).as("pa"), col(bCol).as("pb"))
      .localCheckpoint(eager = false)
    val touched = touchedVertices(prev, "id", "label", pairs, "pa", "pb")
      .localCheckpoint(eager = false)
    // checkpointed for the same two-consumer reason as pairs/touched:
    // batchVerts feeds cVerts AND the relabeled union — unpinned, the
    // newVertices scan + anti-join against prev executed twice
    val batchVerts = newVertices.select(col(newIdCol).as("id"))
      .join(prev, Seq("id"), "left_anti")
      .localCheckpoint(eager = false)
    // contract: endpoint → its prior cluster label (old endpoints are
    // in `touched` by construction; batch endpoints map to themselves)
    val cEdges = pairs
      .join(touched.select(col("id").as("pa"), col("label").as("la")), Seq("pa"), "left")
      .join(touched.select(col("id").as("pb"), col("label").as("lb")), Seq("pb"), "left")
      .select(coalesce(col("la"), col("pa")).as("a"),
        coalesce(col("lb"), col("pb")).as("b"))
    val cVerts = touched.select(col("label").as("id")).distinct()
      .union(batchVerts)
    val rootCC = connectedComponents(cVerts, "id", cEdges, "a", "b", maxIter)
      .localCheckpoint(eager = false)
    // expand: members inherit their root's re-converged label
    val relabeled = touched
      .join(rootCC.select(col("id").as("label"), col("cluster_id")), Seq("label"))
      .select(col("id"), col("cluster_id"))
      .union(batchVerts.join(rootCC, Seq("id")).select(col("id"), col("cluster_id")))
    val untouched = prev
      .join(touched.select(col("label")).distinct(), Seq("label"), "left_anti")
      .select(col("id"), col("label").as("cluster_id"))
    untouched.union(relabeled)
  }
}
