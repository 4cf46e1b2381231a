package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** plans.PrefixSkipHot + the stop-shingle-ordered prefix path: the
  * zipf quadratic-bucket fix must change CANDIDATE VOLUME only, never
  * the result set (the AllPairs proof holds for any corpus-consistent
  * total order). */
class PrefixSkipHotSpec extends SparkSpec {
  import spark.implicits._

  private def skipHot(hs: Seq[Long], k: Int, hot: Seq[Long]): Seq[Long] = {
    val df = Seq((hs, k)).toDF("hs", "k")
      .select(graft.plans.PrefixSkipHot(col("hs"), col("k"), hot).as("p"))
    df.as[Seq[Long]].collect().head
  }

  test("empty hot list reproduces the plain head slice") {
    assert(skipHot(Seq(1L, 5L, 9L, 12L), 2, Nil) === Seq(1L, 5L))
    assert(skipHot(Seq(7L), 3, Nil) === Seq(7L))
  }

  test("hot shingles are skipped in hash order") {
    // 5 is hot: the 2-prefix walks past it
    assert(skipHot(Seq(1L, 5L, 9L, 12L), 2, Seq(5L)) === Seq(1L, 9L))
    // all leading entries hot: prefix comes from the tail
    assert(skipHot(Seq(1L, 5L, 9L, 12L), 2, Seq(1L, 5L)) === Seq(9L, 12L))
  }

  test("nearly-all-hot docs fill from the hot segment in LIST order") {
    // only one non-hot element; the second prefix slot comes from the
    // doc's hot elements ordered by hot-list position (9 before 5,
    // because the list ranks 9 first)
    assert(skipHot(Seq(1L, 5L, 9L), 2, Seq(9L, 5L)) === Seq(1L, 9L))
    // no non-hot at all: pure hot-rank fill
    assert(skipHot(Seq(5L, 9L), 2, Seq(9L, 5L)) === Seq(9L, 5L))
  }

  test("zipf-hot corpus: skew-safe pairs equal plain-order pairs") {
    // a planted corpus where one shingle ("aa bb cc") is corpus-hot:
    // near-dup pair (1,2) must survive whichever order the prefix uses
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg zz"),
      (3L, "aa bb cc qq rr ss tt uu"),
      (4L, "aa bb cc vv ww xx yy mm"),
      (5L, "aa bb cc nn oo pp kk jj")
    ).toDF("doc_id", "text")
    val t = 0.6
    val plain = graft.operators.Dedup
      .jaccardPairsPrefixFromText(docs, "doc_id", "text", 3, t)
      .orderBy("a_id", "b_id").collect().toSeq
    val hot = graft.operators.Dedup
      .hotShingles(docs, "doc_id", "text", 3, sampleMod = 1,
        floorMult = 2.0)
    assert(hot.nonEmpty, "planted hot shingle not detected")
    val safe = graft.operators.Dedup
      .jaccardPairsPrefixFromText(docs, "doc_id", "text", 3, t, hot)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(plain.nonEmpty)
    assert(safe === plain)
  }

  test("registered dd_ngram_jaccard result unchanged by the hot-list stage") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.DedupQueries.queries("dd_ngram_jaccard")(spark, dir)
      .collect().toSeq
    val plain = graft.operators.Dedup
      .jaccardPairsPrefixFromText(
        graft.Tables.documents(spark, dir), "doc_id", "text",
        graft.queries.DedupQueries.ShingleN,
        graft.queries.DedupQueries.JaccardThreshold)
      .repartition(1).dropDuplicates()
      .sortWithinPartitions("a_id", "b_id").collect().toSeq
    assert(got === plain)
  }
}
