package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, built entirely
  * from codegen'd Spark built-ins (split / transform / aggregate /
  * xxhash64) — no UDFs, so every column here stays inside whole-stage
  * codegen and scales linearly with input bytes.
  *
  * Capability extension beyond the reference (which only does regex
  * validation of a column, `local_runner.py:94-99`); required by the
  * north-star: language-ID, quality scoring, token counting, document
  * fingerprinting over the `documents` table.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style BPE pre-tokenizer pattern (Radford et al. 2019,
    * "Language Models are Unsupervised Multitask Learners", the
    * `gpt2.bpe` regex): contraction suffixes, space-prefixed letter
    * runs, digit runs, punctuation runs, residual whitespace.
    * Simplified: the original's `\s+(?!\S)` trailing-space lookahead is
    * dropped so the pattern stays within RE2 semantics and the DuckDB
    * oracle tokenizes identically. */
  val BpeTokenPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish subword pre-tokens — the token-count basis an LLM data
    * pipeline budgets with (whitespace tokens undercount CJK/punct-heavy
    * text badly). Codegen'd `regexp_extract_all`; the compiled pattern
    * is reused per task. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Sum of token lengths (for mean-word-length style quality features). */
  def sumTokenLen(text: Column): Column = sumTokenLenT(tokens(text))

  /** How many tokens appear in `words` (NOT deduplicated — each
    * occurrence counts, matching a stopword-ratio definition). */
  def wordHits(text: Column, words: Seq[String]): Column =
    wordHitsT(tokens(text), words)

  // `*T` variants take an already-computed token array. Callers that
  // derive several features from one document should stage the tokens
  // with withColumn and use these: every lambda referencing tokens(text)
  // inline re-splits the text (no CSE across lambda trees).

  def sumTokenLenT(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t))

  def wordHitsT(toks: Column, words: Seq[String]): Column = {
    val dict = array(words.map(lit): _*)
    aggregate(toks, lit(0),
      (acc, t) => acc + when(array_contains(dict, t), 1).otherwise(0))
  }

  // ---- One-pass native profile ------------------------------------------
  //
  // The `*T` HOF formulations above are correct but run through the
  // lambda interpreter (higher-order functions are CodegenFallback):
  // language-ID alone walks the token array once per dictionary. The
  // `*P` variants below read a single `array<bigint>` profile column
  // computed by the native [[TokenProfile]] expression — ONE pass over
  // the tokens for sum-of-lengths plus every dictionary's hit count.
  // The HOF versions stay as the differential-test reference.

  /** Dictionaries baked into the profile: one per language (in
    * [[StopwordsByLang]] order) plus the combined list used by the
    * quality score's stopword ratio. */
  lazy val ProfileDicts: Seq[Seq[String]] =
    StopwordsByLang.map(_._2) :+ StopwordsByLang.flatMap(_._2)

  /** `[sum_tok_len, hits(en), hits(de), hits(es), hits(fr), hits(all)]`
    * as `array<bigint>`, computed natively in one token pass. */
  def profileT(toks: Column): Column =
    TokenProfile.tokenProfile(toks, ProfileDicts)

  def sumTokenLenP(prof: Column): Column = element_at(prof, 1)

  /** Per-language stopword-hit columns, in [[StopwordsByLang]] order. */
  def langScoresP(prof: Column): Seq[(String, Column)] =
    StopwordsByLang.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(prof, i + 2)
    }

  /** Hits against the combined stopword list (quality-score input). */
  def stopAllHitsP(prof: Column): Column =
    element_at(prof, ProfileDicts.length + 1)

  /** Same argmax/tie-break semantics as [[langIdT]], reading the
    * profile instead of re-walking the tokens per language. */
  def langIdP(prof: Column): Column = {
    val scores = langScoresP(prof)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, "und")) { case (acc, (lang, score)) =>
      acc.when(score === best, lang)
    }
  }

  /** Same formula as [[qualityScoreT]] over profile columns. */
  def qualityScoreP(nTokens: Column, prof: Column): Column = {
    val n = nTokens.cast("double")
    val meanLen = sumTokenLenP(prof).cast("double") / n
    val stopRatio = stopAllHitsP(prof).cast("double") / n
    val lengthTerm = least(n / lit(16.0), lit(1.0))
    val wordLenTerm = when(meanLen.between(2.0, 9.0), 1.0).otherwise(0.5)
    val stopTerm = least(stopRatio * 4.0, lit(1.0))
    round(lengthTerm * 0.4 + wordLenTerm * 0.4 + stopTerm * 0.2, 4)
  }

  /** Tiny per-language stopword tables for the n-gram/stopword
    * language-ID heuristic. */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une"))

  /** Predicted language = argmax of stopword hits, ties broken by list
    * order, zero hits ⇒ "und" (undetermined). Deterministic, and simple
    * enough to mirror in the DuckDB oracle. */
  def langId(text: Column): Column = langIdT(tokens(text))

  def langIdT(toks: Column): Column = {
    val scores = StopwordsByLang.map { case (lang, words) =>
      lang -> wordHitsT(toks, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, "und")) { case (acc, (lang, score)) =>
      acc.when(score === best, lang)
    }
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, plausible
    * mean word length, and some stopword presence. Heuristic, but every
    * term is a plain arithmetic expression (oracle-mirrorable). */
  def qualityScore(text: Column): Column = qualityScoreT(tokens(text))

  def qualityScoreT(toks: Column): Column = {
    val n = size(toks).cast("double")
    val meanLen = sumTokenLenT(toks).cast("double") / n
    val stopRatio = wordHitsT(toks, StopwordsByLang.flatMap(_._2)).cast("double") / n
    val lengthTerm = least(n / lit(16.0), lit(1.0))
    val wordLenTerm = when(meanLen.between(2.0, 9.0), 1.0).otherwise(0.5)
    val stopTerm = least(stopRatio * 4.0, lit(1.0))
    round(lengthTerm * 0.4 + wordLenTerm * 0.4 + stopTerm * 0.2, 4)
  }

  /** Word k-shingles: overlapping k-token windows joined by a space
    * (input to MinHash). Empty array when the doc has < k tokens. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Winnowing-style document fingerprint (after Schleimer/Wilkerson/
    * Aiken, "Winnowing: local algorithms for document fingerprinting",
    * SIGMOD 2003): min of a 64-bit hash over all `w`-token windows. Two
    * documents sharing any minimal window collide — a cheap near-dup
    * prefilter and a stable content fingerprint.
    *
    * Implementation note: tokens are hashed once, then the window scan
    * runs in [[RollingMinHash]] — a native codegen'd expression —
    * because the sequence/transform/aggregate formulation goes through
    * interpreted higher-order functions (O(n·w) interpreter dispatches
    * per row; measured ~6s for 5k docs at sf0.1 even warm). */
  def fingerprint(text: Column, w: Int = 8): Column = {
    val th = transform(tokens(text), t => xxhash64(t))
    coalesce(RollingMinHash.rollingMinHash(th, w), xxhash64(trim(text)))
  }
}
