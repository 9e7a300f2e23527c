package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines, all
 * expressed as codegen'd column expressions (no UDFs in the hot path) so
 * they run at scan speed over 100 TB of documents.
 */
object TextAnalysis {

  /** whitespace tokens (lowercased) */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish subword count: whitespace tokens + punctuation boundaries +
    * a length penalty approximating subword splits (a cheap deterministic
    * stand-in for a real tokenizer's token count). */
  def tokenCountBpeIsh(text: Column): Column = {
    val words = size(tokens(text))
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    val longWordExtra = size(filter(tokens(text), t => length(t) > 8))
    (words + punct + longWordExtra).cast("long")
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  private val stopwords = Seq(
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "an", "be", "this", "are", "or")

  /** Quality signals: length, word stats, punctuation & stopword ratios —
    * the standard cheap filters of web-corpus pipelines. */
  def qualityColumns(text: Column): Seq[Column] = {
    val t = tokens(text)
    val words = size(t).cast("double")
    val chars = length(text).cast("double")
    Seq(
      chars.as("n_chars_q"),
      words.cast("long").as("n_words"),
      (chars / greatest(words, lit(1.0))).as("avg_word_len"),
      ((length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
        greatest(chars, lit(1.0))).as("punct_ratio"),
      (size(filter(t, w => w.isInCollection(stopwords))).cast("double") /
        greatest(words, lit(1.0))).as("stopword_ratio"))
  }

  /** Marker-word language vote: per language a small marker set; predicted
    * lang = argmax votes, default "und". N-gram-free heuristic that stays
    * in codegen (map_filter/argmax via array sort). */
  private[graft] val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "una", "por", "es"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "it" -> Seq("il", "che", "di", "per", "con"))

  def langIdHeuristic(text: Column): Column =
    graft.functions.TextHash.langId(text, langMarkers.toSeq.sortBy(_._1))

  /** Word n-gram shingles. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
  }

  /**
   * Winnowing document fingerprint (Schleimer et al., SIGMOD 2003): hash
   * all k-gram shingles in order, take the min hash of each sliding window
   * of `w`, dedupe — robust to local edits, used for plagiarism/near-dup
   * detection. Returns a sorted array<long> of selected hashes.
   *
   * One codegen'd pass ([[graft.functions.WinnowFingerprintExpr]]: chained
   * token-hash k-grams → monotonic-deque window min, O(n)). The original
   * `transform(sequence(...), i => array_min(slice(...)))` formulation
   * evaluated interpreted AND allocated an O(w) slice per window — the same
   * trap the MinHash path escaped (see TextHashes.scala scaladoc).
   */
  def winnowingFingerprint(text: Column, k: Int = 3, w: Int = 4): Column =
    graft.functions.TextHash.winnowFingerprint(text, k, w)

  /** Winnowing selection over caller-supplied ordered k-gram hashes —
    * lets pipelines plug their own hash while keeping the O(n) codegen'd
    * window-min kernel. */
  def winnowingMins(orderedHashes: Column, w: Int = 4): Column =
    graft.functions.TextHash.winnowMins(orderedHashes, w)
}
