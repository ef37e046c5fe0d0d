package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (BASELINE.json
  * north-star surface): language-ID heuristic, quality scoring, token
  * counting, document fingerprinting. All pure expressions (codegen'd), each
  * with a SQL mirror for the oracle.
  */
object TextAnalysis {

  /** Count occurrences of a marker token in a token array. */
  def markerCount(tokens: Column, word: String): Column =
    size(filter(tokens, t => t === word)).cast("long")

  def markerCountSql(toks: String, word: String): String =
    s"CAST(len(list_filter($toks, t -> t = '$word')) AS BIGINT)"

  /** N-gram-marker language-ID heuristic: argmax of marker-token counts with
    * a fixed tie order. Real language ID swaps in character-n-gram profiles;
    * the engine shape (per-row scoring, no shuffle) is identical. */
  def langId(nThe: Column, nA: Column, nData: Column): Column =
    when(nThe >= nA && nThe >= nData, lit("en"))
      .when(nA >= nData, lit("fr"))
      .otherwise(lit("de"))

  def langIdSql(nThe: String, nA: String, nData: String): String =
    s"CASE WHEN $nThe >= $nA AND $nThe >= $nData THEN 'en' " +
      s"WHEN $nA >= $nData THEN 'fr' ELSE 'de' END"

  /** Mean token length of a single-space-joined text:
    * (chars − separators) / n_tokens. */
  def avgTokenLen(text: Column, nTok: Column): Column =
    (length(text).cast("double") - (nTok.cast("double") - 1.0)) / nTok.cast("double")

  def avgTokenLenSql(text: String, nTok: String): String =
    s"(CAST(length($text) AS DOUBLE) - (CAST($nTok AS DOUBLE) - 1.0)) / CAST($nTok AS DOUBLE)"

  /** Stopword ratio over a fixed stoplist. */
  val Stopwords = Seq("the", "a", "of")

  def stopwordCount(tokens: Column): Column =
    size(filter(tokens, t => Stopwords.map(t === _).reduce(_ || _))).cast("long")

  def stopwordCountSql(toks: String): String =
    s"CAST(len(list_filter($toks, t -> t IN (${Stopwords.map("'" + _ + "'").mkString(", ")}))) AS BIGINT)"

  /** Composite quality score in [0,1]: balanced length term + low-stopword
    * term. Deterministic arithmetic, mirrored in SQL. */
  def qualityScore(nTok: Column, stopRatio: Column): Column =
    least(nTok.cast("double") / 100.0, lit(1.0)) * 0.5 + (lit(1.0) - stopRatio) * 0.5

  def qualityScoreSql(nTok: String, stopRatio: String): String =
    s"least(CAST($nTok AS DOUBLE) / 100.0, 1.0) * 0.5 + (1.0 - $stopRatio) * 0.5"

  /** Order-sensitive document fingerprint: position-weighted token-hash sum
    * mod a prime (a rolling-hash-style content signature; exact integer
    * arithmetic, portable to SQL). */
  val FpMod = 1000000007L
  def fingerprint(tokenHashes: Column): Column = {
    val weighted = zip_with(
      tokenHashes,
      sequence(lit(1L), size(tokenHashes).cast("long")),
      (h, i) => h * i)
    aggregate(weighted, lit(0L), (acc, v) => acc + v) % FpMod
  }

  def fingerprintSql(toksExpr: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($toksExpr)), " +
      s"i -> ${Dedup.tokHashSql(s"$toksExpr[i]")} * i)) % $FpMod AS BIGINT)"
}
