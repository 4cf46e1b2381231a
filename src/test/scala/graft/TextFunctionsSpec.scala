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

  test("scrubPii redacts email, phone and IP; counts see each once") {
    val df = one("reach me at jo.doe+x@foo.bar.org or +380-44-1234567, host 192.168.0.1 ok")
    val r = df.select(
      piiCount(col("text"), EmailRegex).as("e"),
      piiCount(col("text"), PhoneRegex).as("p"),
      piiCount(col("text"), Ipv4Regex).as("i"),
      scrubPii(col("text")).as("s"))
      .as[(Long, Long, Long, String)].head()
    assert(r._1 === 1L && r._2 === 1L && r._3 === 1L)
    assert(r._4 === "reach me at <EMAIL> or <PHONE>, host <IP> ok")
  }

  test("scrubPii passes clean text through untouched") {
    val clean = "no personal data in this sentence at all"
    assert(one(clean).select(scrubPii(col("text"))).as[String].head() === clean)
  }

  test("trainSplit is deterministic, total, and keyed on the id") {
    val df = (1L to 1000L).toDF("id")
      .select(col("id"), trainSplit(col("id")).as("split"))
    val counts = df.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    // expectation 12/16 - 2/16 - 2/16; allow generous slack
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    assert(counts.values.sum === 1000L)
    // same keys -> same assignment on re-evaluation
    val again = df.select(trainSplit(col("id"))).as[String].collect()
    assert(again.toSeq === df.select("split").as[String].collect().toSeq)
  }
}
