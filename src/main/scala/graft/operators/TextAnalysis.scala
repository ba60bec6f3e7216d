package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs._

/** Text-analysis operators for training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All are
  * single-pass narrow projections (no shuffle) built from codegen'd
  * string/regexp functions plus higher-order array folds — at 100 TB
  * these scale linearly with input and never repartition.
  */
object TextAnalysis {

  /** Token counts: whitespace tokens and BPE-ish regex tokens
    * (letter runs / digit runs / punctuation runs), plus char counts.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      expr(tokenCountSpark(textCol)).cast("long").as("n_tokens_ws"),
      expr(regexpCountSpark(textCol, bpeClass)).cast("long").as("n_tokens_bpe"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Quality heuristics, all in deterministic fixed-point ppm:
    * punctuation ratio, stopword ratio, mean word length, and a
    * blended 0..1e6 quality score.
    */
  def quality(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = textCol
    val nTokens = tokenCountSpark(t)
    val nPunct = regexpCountSpark(t, punctClass)
    val nStop = regexpCountSpark(t, stopwordPattern)
    val nNonSpace = s"length(regexp_replace($t, '\\\\s', ''))"
    val score =
      s"""floor(1e6 * (
         |  4e-1 * least(1e0, ($nTokens) / 64e0) +
         |  3e-1 * (1e0 - CASE WHEN length($t) = 0 THEN 0e0 ELSE ($nPunct) * 1e0 / length($t) END) +
         |  3e-1 * CASE WHEN ($nTokens) = 0 THEN 0e0 ELSE ($nStop) * 1e0 / ($nTokens) END))""".stripMargin
    docs.select(
      col(idCol),
      expr(nTokens).cast("long").as("n_tokens"),
      expr(ppmSpark(nPunct, s"length($t)")).cast("long").as("punct_ppm"),
      expr(ppmSpark(nStop, nTokens)).cast("long").as("stopword_ppm"),
      expr(ppmSpark(nNonSpace, nTokens)).cast("long").as("mean_word_len_ppm"),
      expr(score).cast("long").as("quality_ppm"))
  }

  /** DuckDB twin of [[quality]]'s projection list (minus the id). */
  def qualityDuckProjection(t: String): String = {
    val nTokens = tokenCountDuck(t)
    val nPunct = regexpCountDuck(t, punctClassDuck)
    val nStop = regexpCountDuck(t, stopwordPatternDuck)
    val nNonSpace = s"length(regexp_replace($t, '\\s', '', 'g'))"
    val score =
      s"""CAST(floor(1e6 * (
         |  4e-1 * least(1e0, ($nTokens) / 64e0) +
         |  3e-1 * (1e0 - CASE WHEN length($t) = 0 THEN 0e0 ELSE ($nPunct) * 1e0 / length($t) END) +
         |  3e-1 * CASE WHEN ($nTokens) = 0 THEN 0e0 ELSE ($nStop) * 1e0 / ($nTokens) END)) AS BIGINT)""".stripMargin
    s"""CAST($nTokens AS BIGINT) AS n_tokens,
       |  ${ppmDuck(nPunct, s"length($t)")} AS punct_ppm,
       |  ${ppmDuck(nStop, nTokens)} AS stopword_ppm,
       |  ${ppmDuck(nNonSpace, nTokens)} AS mean_word_len_ppm,
       |  $score AS quality_ppm""".stripMargin
  }

  /** Language-ID heuristic: per-language stopword hit counts plus a
    * CJK-codepoint count, argmax with a fixed priority order. (A real
    * deployment would use character-n-gram profiles; the *shape* — a
    * narrow scan projecting regexp counts — is identical.)
    */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lower = s"lower($textCol)"
    val scores = langStopwords.map { case (lang, words) =>
      lang -> regexpCountSpark(lower, s"\\\\b$words\\\\b")
    }
    val zh = regexpCountSpark(textCol, cjkClassSpark)
    val Seq(en, de, es, fr) = scores.map(_._2)
    val pred =
      s"""CASE WHEN ($zh) > 0 THEN 'zh'
         | WHEN ($en) >= ($de) AND ($en) >= ($es) AND ($en) >= ($fr) THEN 'en'
         | WHEN ($de) >= ($es) AND ($de) >= ($fr) THEN 'de'
         | WHEN ($es) >= ($fr) THEN 'es'
         | ELSE 'fr' END""".stripMargin.replaceAll("\n", "")
    docs.select(
      col(idCol) +:
        scores.map { case (lang, e) => expr(e).cast("long").as(s"hits_$lang") } :+
        expr(zh).cast("long").as("hits_zh") :+
        expr(pred).as("lang_pred"): _*)
  }

  /** DuckDB twin of [[langId]]'s projection list (minus the id). */
  def langIdDuckProjection(t: String): String = {
    val lower = s"lower($t)"
    val scores = langStopwords.map { case (lang, words) =>
      lang -> regexpCountDuck(lower, s"\\b$words\\b")
    }
    val zh = regexpCountDuck(t, cjkClassDuck)
    val Seq(en, de, es, fr) = scores.map(_._2)
    val pred =
      s"""CASE WHEN ($zh) > 0 THEN 'zh'
         | WHEN ($en) >= ($de) AND ($en) >= ($es) AND ($en) >= ($fr) THEN 'en'
         | WHEN ($de) >= ($es) AND ($de) >= ($fr) THEN 'de'
         | WHEN ($es) >= ($fr) THEN 'es'
         | ELSE 'fr' END""".stripMargin.replaceAll("\n", "")
    (scores.map { case (lang, e) => s"CAST($e AS BIGINT) AS hits_$lang" } :+
      s"CAST($zh AS BIGINT) AS hits_zh" :+
      s"$pred AS lang_pred").mkString(",\n  ")
  }

  /** Document fingerprint: polynomial rolling hash over the full text
    * (content-defined identity for exact dedup / incremental diffing).
    */
  def fingerprint(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    graft.functions.PolyHash.register(docs.sparkSession)
    docs.select(
      col(idCol),
      expr(charHashSpark(textCol)).as("fingerprint"))
  }
}
