package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions.col

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("wordShingles guards short texts (no slice(0) crash)") {
    val out = one("only two").select(wordShingles(col("text"), 3)).as[Seq[String]].head()
    assert(out === Seq.empty)
  }

  test("wordShingles emits n-grams in order") {
    val out = one("a b c d").select(wordShingles(col("text"), 2)).as[Seq[String]].head()
    assert(out === Seq("a b", "b c", "c d"))
  }

  test("shingleSet dedups repeated shingles") {
    val out = one("x y x y x y").select(shingleSet(col("text"), 2)).as[Seq[String]].head()
    assert(out.sorted === Seq("x y", "y x"))
  }

  test("fingerprint is normalization-invariant") {
    val fps = Seq("Hello, World!", "hello   world", "HELLO world.")
      .toDF("text").select(fingerprint(col("text")).as("fp"))
      .as[String].collect().toSet
    assert(fps.size === 1)
  }

  test("langId picks the marker-richest language, earlier wins ties") {
    val df = Seq(
      "the cat and the dog is here",   // en
      "der hund und die katze ist da", // de
      "zzz qqq www").toDF("text")      // no markers anywhere -> en (first)
    val out = df.select(langId(col("text"))).as[String].collect().toSeq
    assert(out === Seq("en", "de", "en"))
  }

  test("quality signals on punctuation-free single token") {
    val r = one("hello")
      .select(tokenCount(col("text")).as("n"), punctRatio(col("text")).as("p"),
        meanTokenLen(col("text")).as("m"))
      .as[(Int, Double, Double)].head()
    assert(r === ((1, 0.0, 5.0)))
  }
}
