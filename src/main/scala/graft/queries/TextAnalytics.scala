package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis queries over the documents table: token counting,
  * language-ID heuristic, quality scoring, rolling-hash fingerprinting.
  * Every formula is mirrored exactly in the DuckDB oracle SQL.
  */
object TextAnalytics {

  def q20Tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"),
        round(avgWordLen(col("text")), 6).as("avg_word_len"))
      .orderBy(col("doc_id"))

  def q21LangId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        langId(col("text")).as("lang_pred"))
      .withColumn("is_match", col("lang") === col("lang_pred"))
      .orderBy(col("doc_id"))

  def q22Quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        round(stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(punctRatio(col("text")), 6).as("punct_ratio"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  def q23Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_tokens" -> (q20Tokens _),
    "q21_langid" -> (q21LangId _),
    "q22_quality" -> (q22Quality _),
    "q23_fingerprint" -> (q23Fingerprint _),
  )

  private val enList = EnStop.map(w => s"'$w'").mkString("[", ",", "]")
  private val deList = DeStop.map(w => s"'$w'").mkString("[", ",", "]")
  private val esList = EsStop.map(w => s"'$w'").mkString("[", ",", "]")
  private val frList = FrStop.map(w => s"'$w'").mkString("[", ",", "]")

  val oracleSql: Map[String, String] = Map(
    "q20_tokens" ->
      """SELECT doc_id,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                CAST(length(text) AS BIGINT) AS n_chars_actual,
                round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 6) AS avg_word_len
         FROM documents ORDER BY doc_id""",
    "q21_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
          sc AS (SELECT doc_id, lang,
                 len(list_filter(toks, x -> list_contains($enList, x))) AS en,
                 len(list_filter(toks, x -> list_contains($deList, x))) AS de,
                 len(list_filter(toks, x -> list_contains($esList, x))) AS es,
                 len(list_filter(toks, x -> list_contains($frList, x))) AS fr
                 FROM t)
          SELECT doc_id, lang,
                 CASE WHEN en > 0 AND en >= de AND en >= es AND en >= fr THEN 'en'
                      WHEN de > 0 AND de >= es AND de >= fr THEN 'de'
                      WHEN es > 0 AND es >= fr THEN 'es'
                      WHEN fr > 0 THEN 'fr'
                      ELSE 'unk' END AS lang_pred,
                 lang = (CASE WHEN en > 0 AND en >= de AND en >= es AND en >= fr THEN 'en'
                      WHEN de > 0 AND de >= es AND de >= fr THEN 'de'
                      WHEN es > 0 AND es >= fr THEN 'es'
                      WHEN fr > 0 THEN 'fr'
                      ELSE 'unk' END) AS is_match
          FROM sc ORDER BY doc_id""",
    "q22_quality" ->
      s"""WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
          m AS (SELECT doc_id,
                CAST(len(list_filter(toks, x -> list_contains($enList, x))) AS DOUBLE)
                  / CAST(len(toks) AS DOUBLE) AS stop_ratio,
                CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                  / CAST(length(text) AS DOUBLE) AS punct_ratio,
                CAST(len(toks) AS DOUBLE) AS n_toks
                FROM t)
          SELECT doc_id, round(stop_ratio, 6) AS stop_ratio,
                 round(punct_ratio, 6) AS punct_ratio,
                 round(0.5 * least(1.0, n_toks / 100.0)
                       + 0.3 * stop_ratio + 0.2 * (1.0 - punct_ratio), 6) AS quality
          FROM m ORDER BY doc_id""",
    "q23_fingerprint" ->
      """SELECT doc_id,
                list_reduce(list_transform(string_split(text, ''), x -> CAST(ord(x) AS BIGINT)),
                            (a, b) -> (a * 31 + b) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""",
  )
}
