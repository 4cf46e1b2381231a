package graft

import org.apache.spark.sql.functions._

/** Pins the native one-scan counters (plans/BpePieceCount,
  * plans/PunctCount) value-identical to the regex forms they replace,
  * on an adversarial fixture plus the real documents table — the same
  * live-oracle discipline SocketIoFrameSpec uses.
  */
class BpePieceCountSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    "",                          // no match
    " ",                         // space: no alternative matches
    "hello world",               // two letter runs
    "abc123def",                 // run, 3 single digits, run
    "a!b?c",                     // runs split by punct singles
    "!!!",                       // three punct singles
    "42",                        // two digit singles
    "  leading and trailing  ",
    "tabs\tand\nnewlines",       // \t \n are [^A-Za-z0-9 ] singles
    "héllo wörld",               // non-ASCII letters fall to the single-char class
    "emoji 😀 pair",   // 4-byte supplementary code point = ONE piece
    "ҐґЇїЄє",                    // 2-byte Cyrillic, six singles
    "mixed: 3.14, 100%",
    "a" * 1000,                  // one long run
    ("ab " * 500).trim
  ).toDF("text")

  private def docsSample = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("text")).limit(2000)
    docs
  }

  test("bpe_piece_count == size(regexp_extract_all(BpeRegex)) on fixture + corpus") {
    for (df <- Seq(fixture, docsSample)) {
      val diff = df.select(
        graft.plans.BpePieceCount(col("text")).as("fast"),
        size(regexp_extract_all(col("text"),
          lit(graft.functions.TextFunctions.BpeRegex), lit(0))).as("slow"),
        col("text"))
        .filter(col("fast") =!= col("slow"))
      val bad = diff.collect()
      assert(bad.isEmpty, s"mismatch rows: ${bad.take(3).mkString("; ")}")
    }
  }

  test("punct_count == size(regexp_extract_all([^A-Za-z0-9 ])) on fixture + corpus") {
    for (df <- Seq(fixture, docsSample)) {
      val diff = df.select(
        graft.plans.PunctCount(col("text")).as("fast"),
        size(regexp_extract_all(col("text"),
          lit("[^A-Za-z0-9 ]"), lit(0))).as("slow"),
        col("text"))
        .filter(col("fast") =!= col("slow"))
      val bad = diff.collect()
      assert(bad.isEmpty, s"mismatch rows: ${bad.take(3).mkString("; ")}")
    }
  }

  test("null text: both native counters return null like the regex form") {
    val row = Seq[Option[String]](None).toDF("text")
      .select(graft.plans.BpePieceCount(col("text")).as("b"),
        graft.plans.PunctCount(col("text")).as("p"))
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}
