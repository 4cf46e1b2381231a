package graft

import graft.functions.TextFunctions
import graft.plans.{BpeTokenCount, BpeTokenizer}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BpeTokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def count(vocab: Seq[String], text: String): Long =
    new BpeTokenizer(vocab.toArray).count(UTF8String.fromString(text))

  test("greedy longest match wins over shorter prefixes") {
    // "abc" beats "ab": abcd -> [abc][d] = 2, not [ab][c][d] = 3
    assert(count(Seq("ab", "abc"), "abcd") === 2L)
    assert(count(Seq("ab"), "abcd") === 3L)
  }

  test("unknown characters fall back to one token each") {
    assert(count(Seq("zz"), "abc") === 3L)
    assert(count(Seq("zz"), "zzzzz") === 3L) // zz zz z
  }

  test("non-letter pieces count one token; letter runs are lowercased") {
    // pieces: "Hello" "," "world" "7" "!" — vocab matches lowercased runs
    assert(count(Seq("hello", "world"), "Hello, world7!") === 5L)
  }

  test("whole-word vocab entries collapse to single tokens") {
    val v = TextFunctions.BpeVocab
    assert(count(v, "table") === 1L)
    assert(count(v, "customer window") === 2L)
  }

  test("empty and whitespace-only text yield zero tokens") {
    assert(count(Seq("a"), "") === 0L)
    assert(count(Seq("a"), "   ") === 0L)
  }

  test("expression matches the tokenizer on real documents, codegen and interpreted") {
    val tok = new BpeTokenizer(TextFunctions.BpeVocab.toArray)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    val got = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextFunctions.bpeSubwordCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === tok.count(UTF8String.fromString(text)),
        s"doc $id disagrees with the scalar tokenizer")
    }
  }

  test("n_bpe >= n_pieces (a piece can only fragment, never fuse)") {
    val bad = graft.queries.TextQueries.txBpeTokens(spark, "/root/testdata/sf0.001")
      .filter(col("n_bpe") < col("n_pieces")).count()
    assert(bad === 0L)
  }

  test("non-ASCII letters are single unknown-char tokens (regex is ASCII-scoped)") {
    // 'é' is outside [A-Za-z]: the pre-tokenizer emits it as one
    // "other" piece (1 token); the ASCII run around it still matches
    val v = Seq("caf", "cr", "me")
    // pieces: [caf][é][cr][è][me] — vocab runs are 1 token each,
    // accented chars 1 unknown token each
    assert(count(v, "café crème") === 5)
  }

  test("null text evaluates to null") {
    val out = Seq((1L, Option.empty[String]), (2L, Some("table")))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.bpeSubwordCount(col("text")).as("n"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L) === Some(1L))
  }

  test("SQL registration resolves (bpe_token_count via call_function)") {
    val n = spark.range(1).select(
      BpeTokenCount(lit("streaming aggregation")).as("n"))
      .as[Long].head()
    // "streaming" -> [stream][ing]; "aggregation" -> [agg][re][g][at][ion]
    assert(n === 7L)
  }
}
