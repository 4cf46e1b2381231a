package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis block over `documents` — the LLM-pipeline signals
  * (token counts, quality heuristics, language ID, fingerprinting,
  * corpus n-gram stats). All pure Column trees from TextFunctions, so
  * every query stays inside whole-stage codegen.
  *
  * Ratio outputs are NOT rounded: both engines divide the same exact
  * integers, so the doubles are bit-identical — rounding would only
  * introduce half-up boundary risk.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  /** (doc_id, text) spread across the session parallelism: documents is
    * single-split parquet, and the per-row tokenize/score trees are the
    * dominant cost — without the spread they run on one core. */
  private def docsSpread(s: SparkSession, dir: String): DataFrame =
    graft.operators.Par.spread(docs(s, dir).select("doc_id", "text"))

  /** Shared DuckDB token list expression (mirror of TextFunctions.tokens). */
  private val toksSql = """string_split_regex(trim(text), '\s+')"""

  // ---- tx_token_count ----------------------------------------------------

  def txTokenCount(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir).select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")

  val txTokenCountSql: String = s"""
    |SELECT doc_id,
    |  len($toksSql) AS n_tokens,
    |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS n_bpe_tokens
    |FROM documents ORDER BY doc_id""".stripMargin

  // ---- tx_quality_score --------------------------------------------------

  def txQualityScore(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      stopwordRatio(col("text")).as("stopword_ratio"),
      punctRatio(col("text")).as("punct_ratio"),
      meanTokenLen(col("text")).as("mean_token_len"))
      .orderBy("doc_id")

  val txQualityScoreSql: String = {
    val stops = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""
    |WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
    |SELECT doc_id,
    |  length(text) AS n_chars,
    |  CAST(len(list_filter(toks, x -> list_contains($stops, x))) AS DOUBLE)
    |    / len(toks) AS stopword_ratio,
    |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
    |    / length(text) AS punct_ratio,
    |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
    |    / len(toks) AS mean_token_len
    |FROM t ORDER BY doc_id""".stripMargin
  }

  // ---- tx_lang_id --------------------------------------------------------

  def txLangId(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir).select(
      col("doc_id"),
      langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** CASE-chain replica of the langId fold: the fold keeps the EARLIER
    * language on ties, so lang k wins only with a strict > over the max
    * of all earlier scores. */
  val txLangIdSql: String = {
    val score = LangMarkers.map { case (lang, markers) =>
      val set = markers.map(w => s"'$w'").mkString("[", ", ", "]")
      lang -> s"len(list_filter(toks, x -> list_contains($set, x)))"
    }
    val Seq(en, de, es, fr) = score.map(_._2)
    s"""
    |WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    |sc AS (SELECT doc_id, $en AS s_en, $de AS s_de, $es AS s_es, $fr AS s_fr FROM t)
    |SELECT doc_id,
    |  CASE WHEN s_fr > greatest(s_en, s_de, s_es) THEN 'fr'
    |       WHEN s_es > greatest(s_en, s_de) THEN 'es'
    |       WHEN s_de > s_en THEN 'de'
    |       ELSE 'en' END AS lang_pred
    |FROM sc ORDER BY doc_id""".stripMargin
  }

  // ---- tx_fingerprint ----------------------------------------------------

  def txFingerprint(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  val txFingerprintSql: String = """
    |SELECT doc_id,
    |  md5(trim(regexp_replace(regexp_replace(lower(text),
    |      '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
    |FROM documents ORDER BY doc_id""".stripMargin

  // ---- tx_ngram_freq -----------------------------------------------------

  /** Corpus top-50 word bigrams. The explode shuffles only (bigram,
    * partial count) pairs thanks to map-side partial aggregation; the
    * final top-N runs on the tiny aggregated set. */
  def txNgramFreq(s: SparkSession, dir: String): DataFrame =
    graft.operators.Par.spread(docs(s, dir).select("text"))
      .select(explode(wordShingles(col("text"), 2)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(50)

  val txNgramFreqSql: String = s"""
    |WITH t AS (SELECT $toksSql AS toks FROM documents),
    |b AS (SELECT toks[i] || ' ' || toks[i+1] AS bigram
    |      FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u)
    |SELECT bigram, count(*) AS n
    |FROM b GROUP BY bigram
    |ORDER BY n DESC, bigram LIMIT 50""".stripMargin

  // ---- registry ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_token_count" -> (txTokenCount _),
    "tx_quality_score" -> (txQualityScore _),
    "tx_lang_id" -> (txLangId _),
    "tx_fingerprint" -> (txFingerprint _),
    "tx_ngram_freq" -> (txNgramFreq _))

  val oracles: Map[String, String] = Map(
    "tx_token_count" -> txTokenCountSql,
    "tx_quality_score" -> txQualityScoreSql,
    "tx_lang_id" -> txLangIdSql,
    "tx_fingerprint" -> txFingerprintSql,
    "tx_ngram_freq" -> txNgramFreqSql)
}
