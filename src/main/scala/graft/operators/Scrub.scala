package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern-based text scrubbing — the PII-redaction pass every
  * training-data pipeline runs before anything else touches the raw
  * corpus (emails, phone numbers, access tokens, …).
  *
  * Rules are plain Java-regex rewrites applied with the built-in
  * `regexp_replace` / `regexp_count` expressions, so the whole pass is
  * codegen'd, map-only, and shuffle-free: at 100 TB it streams through
  * the scan with zero exchanges, and the per-rule hit counts come from
  * the same pass (no second scan). Patterns should stick to the
  * RE2-compatible subset (no backreferences / lookaround) so the same
  * rule set is portable across engines.
  */
object Scrub {

  /** One redaction rule: occurrences of `pattern` become `replacement`. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Common PII rule set (conservative, RE2-safe patterns). */
  val piiRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"),
    Rule("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"))

  /** Apply `rules` in order to `textCol`. Adds one `n_<rule>` hit-count
    * column per rule (counted on the text as that rule sees it, i.e.
    * after the previous rules ran) plus the rewritten `redacted` text
    * and the total hit count. Map-only: one projection, no shuffle. */
  def redact(docs: DataFrame, rules: Seq[Rule],
      textCol: String = "text"): DataFrame = {
    require(rules.nonEmpty, "redact needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    // fold the rewrite chain; count each pattern on its input text.
    // Replacements are LITERAL text: Java's regexp_replace treats '$'
    // and '\' as group references (RE2 engines do not), so escape them
    // — '$1' in a replacement would otherwise throw or diverge across
    // engines, breaking the portability contract above.
    val (finalText, counts) =
      rules.foldLeft((col(textCol), Seq.empty[(String, Column)])) {
        case ((cur, acc), r) =>
          val n = regexp_count(cur, lit(r.pattern)).cast("bigint")
          val literal = r.replacement
            .replace("\\", "\\\\").replace("$", "\\$")
          (regexp_replace(cur, r.pattern, literal),
            acc :+ (s"n_${r.name}", n))
      }
    val withCounts = counts.foldLeft(docs) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }
    withCounts
      .withColumn("redacted", finalText)
      .withColumn("n_redacted",
        counts.map(c => col(c._1)).reduce(_ + _))
  }

  /** Canonical text normalization — the step-zero rewrite every hash
    * downstream depends on (exact dedup, shingles, MinHash bands,
    * segment hashes all treat "é" composed vs decomposed as different
    * documents): Unicode-normalize (native codegen'd
    * [[graft.functions.UnicodeNormalize]], NFC by default), optionally
    * lowercase, and collapse whitespace runs to single spaces.
    * Map-only; `changed` marks rows the rewrite touched (the fraction
    * that actually needed repair is itself a corpus-health signal). */
  def normalizeText(docs: DataFrame, form: String = "NFC",
      lower: Boolean = true, collapseWs: Boolean = true,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = col(textCol)
    val cased = if (lower) org.apache.spark.sql.functions.lower(base) else base
    val ws = if (collapseWs)
      regexp_replace(trim(cased), "\\s+", " ") else cased
    val norm = graft.functions.UnicodeNormalize.unicodeNormalize(ws, form)
    docs.select(col(idCol), norm.as("text_norm"),
      (norm =!= base).as("changed"))
      .orderBy(col(idCol))
  }
}
