package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data-pipeline work over the `documents`
  * table (doc_id, text, lang, source, n_chars). Everything here is built from
  * `org.apache.spark.sql.functions` so plans stay codegen'd/prunable and the
  * DuckDB oracle can mirror them; the only Scala function is the rolling-hash
  * fingerprint (mirrored in DuckDB by an ascii fold).
  */
object TextOps {

  /** Fixture text is single-space separated; split-on-space IS the tokenizer
    * (a BPE-ish `\w+|[^\w\s]` regex variant is exposed separately).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Regex token estimate (word runs + single punctuation marks). */
  def regexTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+|(?<=\\W)|(?=\\W)"), t => length(t) > 0))

  /** Occurrence count of tokens from a fixed vocabulary. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(vocab)))

  // tiny per-language stopword profiles for the lang-id heuristic
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "los"),
    "fr" -> Seq("le", "la", "et", "est", "de", "un", "une"))

  /** Language-ID heuristic: stopword-profile hit rates, argmax with a fixed
    * profile-order tie-break (deterministic; mirrored as a CASE chain in SQL).
    */
  def langId(text: Column): Column = {
    val scores = Profiles.map { case (l, words) => l -> vocabHits(text, words) }
    scores.tail.foldLeft((scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (l, s)) =>
        (greatest(bestScore, s), when(s > bestScore, lit(l)).otherwise(bestLang))
    }._2
  }

  /** Quality score in [0,1]: blend of length, mean token length, and
    * alpha-space purity — the usual cheap pretraining-filter features.
    */
  def qualityScore(text: Column): Column = {
    val nTok     = tokenCount(text).cast("double")
    val nChar    = length(text).cast("double")
    val alphaLen = length(regexp_replace(text, "[^a-zA-Z ]", "")).cast("double")
    val lenScore = least(nChar / lit(500.0), lit(1.0))
    val tokLen   = (nChar - (nTok - lit(1.0))) / nTok // mean token length
    val tokScore = when(tokLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    val purity   = alphaLen / nChar
    round(lit(0.4) * lenScore + lit(0.2) * tokScore + lit(0.4) * purity, 9)
  }

  /** Per-document repetition statistics — the standard corpus-quality
    * repetition rules (duplicate-line fraction, duplicate-2-gram fraction,
    * duplicate-token fraction, top-2-gram token share), each rendered as
    * exact integer micros so the DuckDB oracle replays them bit-for-bit.
    * One map-side pass per doc (a UDF for the same reason as
    * `Dedup.shingleSetUdf`: the HOF chain evaluates interpreted and
    * re-evaluates the outer split per lambda element). Definitions:
    *   dup_line_micros  = 1 − distinct_lines/lines        (lines = '\n' split)
    *   dup_2gram_micros = 1 − distinct_2grams/2grams      (word 2-grams)
    *   dup_token_micros = 1 − distinct_tokens/tokens
    *   top_2gram_micros = 2·count(most frequent 2-gram)/tokens
    * Degenerate inputs (<2 tokens, empty) yield 0 — same CASE guards as the
    * SQL mirror. Splits keep trailing empties (limit −1), matching Spark's
    * split() and DuckDB's string_split.
    */
  case class RepStats(dup_line_micros: Long, dup_2gram_micros: Long,
                      dup_token_micros: Long, top_2gram_micros: Long)

  val repetitionStatsUdf = udf((text: String) => {
    if (text == null) RepStats(0L, 0L, 0L, 0L) else {
      def micros(f: Double): Long = math.floor(f * 1000000.0 + 0.5).toLong
      val ls = text.split("\n", -1)
      val ws = text.split(" ", -1)
      val nl = ls.length
      val lineSet = new java.util.HashSet[String](); ls.foreach(lineSet.add)
      val ndl = lineSet.size
      val nt = ws.length
      val tokSet = new java.util.HashSet[String](); ws.foreach(tokSet.add)
      val ndt = tokSet.size
      val n2 = math.max(nt - 1, 0)
      var maxC = 0; var nd2 = 0
      if (n2 > 0) {
        val counts = new java.util.HashMap[String, Integer]()
        var i = 0
        while (i < nt - 1) {
          val g = ws(i) + " " + ws(i + 1)
          val c: Int = counts.merge(g, 1, (a, b) => a + b)
          if (c > maxC) maxC = c
          i += 1
        }
        nd2 = counts.size
      }
      RepStats(
        micros(if (nl == 0) 0.0 else 1.0 - ndl.toDouble / nl),
        micros(if (n2 == 0) 0.0 else 1.0 - nd2.toDouble / n2),
        micros(if (nt == 0) 0.0 else 1.0 - ndt.toDouble / nt),
        micros(if (nt == 0 || maxC == 0) 0.0 else 2.0 * maxC / nt))
    }
  })

  /** Document fingerprint: Horner rolling hash over character codes,
    * mod 10^12 (fits exact BIGINT arithmetic in both engines).
    */
  def fingerprint(text: String): Long = {
    var h = 0L
    var i = 0
    while (i < text.length) { h = (h * 31 + text.charAt(i).toInt) % 1000000000000L; i += 1 }
    h
  }

  val fingerprintUdf = udf((s: String) => fingerprint(s))

  /** DuckDB mirror of `fingerprint` (explicit BIGINT — the lambda would
    * otherwise infer INT32 and overflow on `a * 31`).
    */
  def fingerprintSql(expr: String): String =
    s"list_reduce(list_prepend(cast(0 as bigint), " +
      s"list_transform(string_split($expr, ''), c -> cast(ascii(c) as bigint))), " +
      s"(a, b) -> (a * 31 + b) % 1000000000000)"

  /** DuckDB mirror of `langId`/`qualityScore` helpers. */
  def vocabHitsSql(expr: String, vocab: Seq[String]): String =
    s"len(list_filter(string_split($expr, ' '), t -> list_contains([${vocab.map("'" + _ + "'").mkString(",")}], t)))"

  def langIdSql(expr: String): String = {
    val scores = Profiles.map { case (l, w) => l -> vocabHitsSql(expr, w) }
    // same fold as langId: later profile wins only on strictly greater score
    scores.tail.foldLeft((scores.head._2, s"'${scores.head._1}'")) {
      case ((bs, bl), (l, s)) =>
        (s"greatest($bs, $s)", s"CASE WHEN $s > $bs THEN '$l' ELSE $bl END")
    }._2
  }

  def qualityScoreSql(expr: String): String = {
    val nTok  = s"cast(len(string_split($expr, ' ')) as double)"
    val nChar = s"cast(length($expr) as double)"
    val alpha = s"cast(length(regexp_replace($expr, '[^a-zA-Z ]', '', 'g')) as double)"
    s"round(0.4 * least($nChar / 500.0, 1.0) " +
      s"+ 0.2 * (CASE WHEN (($nChar - ($nTok - 1.0)) / $nTok) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) " +
      s"+ 0.4 * ($alpha / $nChar), 9)"
  }
}
