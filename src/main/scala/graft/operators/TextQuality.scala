package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Repetition-based quality metrics in the style of the Gopher rules
  * (Rae et al., "Scaling Language Models: Methods, Analysis & Insights
  * from Training Gopher", 2021, §A1.1): heavily repetitive documents
  * (boilerplate, keyword stuffing, scraper loops) are poor training
  * data, and the cheap detector is "what fraction of the document is
  * its own most frequent n-gram / how few distinct tokens does it
  * use".
  *
  * Scale shape: MAP-ONLY — the native [[graft.functions.RepetitionProfile]]
  * expression computes every metric in one hash-map pass per document
  * (all of them are within-document quantities), so the only exchange
  * in the whole query is the final presentation sort. The earlier
  * compositional form (explode bigrams → grouped count → per-doc
  * window) shuffled ~the tokenized corpus twice for the same numbers
  * and was the engine's worst bench-variance query under load.
  */
object TextQuality {

  /** Per-document repetition metrics:
    * n_tokens, n_distinct (tokens), distinct_ratio,
    * top_bigram (lexicographically-first among the most frequent),
    * top_bigram_n, top_bigram_frac (count / total bigrams).
    * Documents with < 2 tokens are dropped — callers filtering junk
    * want them gone anyway. */
  def repetitionMetrics(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      // filter on the cheap size() BEFORE building the profile, so
      // predicate pushdown never duplicates the hash-map pass into a
      // pushed filter condition
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol),
        graft.functions.RepetitionProfile.repetitionProfile(col("__toks"))
          .as("__p"))
      .select(col(idCol),
        col("__p.n_tokens").as("n_tokens"),
        col("__p.n_distinct").as("n_distinct"),
        round(col("__p.n_distinct").cast("double") / col("__p.n_tokens"), 4)
          .as("distinct_ratio"),
        col("__p.top_bigram").as("top_bigram"),
        col("__p.top_bigram_n").as("top_bigram_n"),
        round(col("__p.top_bigram_n").cast("double") /
          (col("__p.n_tokens") - 1), 4).as("top_bigram_frac"))
      .orderBy(col(idCol))

  /** Unicode-script composition per source: what share of each
    * source's characters are Latin letters, digits, Cyrillic, CJK,
    * Greek, whitespace, other — the mixed-script audit that catches
    * script-spoofing spam, mislabeled-language feeds, and markup
    * bleed before they enter a training mix (language-ID upstream of
    * this says WHICH language; this says whether the bytes even agree
    * with the label). Character classes use `\\x{…}` range syntax,
    * valid verbatim in BOTH Java regex and RE2, so engine and oracle
    * evaluate the identical pattern.
    *
    * Map-only regex arithmetic per row, one grouped sum per source. */
  def scriptProfile(docs: DataFrame): DataFrame = {
    val classes = Seq(
      "latin" -> "[A-Za-z]",
      "digit" -> "[0-9]",
      "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
      "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
      "greek" -> "[\\x{0370}-\\x{03FF}]",
      "space" -> "\\s")
    val counted = classes.foldLeft(
      docs.select(col("source"), col("text"),
        length(col("text")).cast("bigint").as("__len"))) {
      case (d, (name, re)) =>
        d.withColumn(s"__c_$name",
          (length(col("text")) -
            length(regexp_replace(col("text"), re, ""))).cast("bigint"))
    }
    val aggs = count(lit(1)).as("n_docs") +:
      sum("__len").as("n_chars") +:
      classes.map { case (n, _) => sum(s"__c_$n").as(s"__s_$n") }
    val agg = counted.groupBy("source").agg(aggs.head, aggs.tail: _*)
    val shares = classes.map { case (n, _) =>
      round(col(s"__s_$n").cast("double") / col("n_chars"), 6)
        .as(s"${n}_share")
    }
    val known = classes.map(c => col(s"__s_${c._1}"))
      .reduce(_ + _)
    agg.select(col("source") +: col("n_docs") +: col("n_chars") +:
      shares :+
      round((col("n_chars") - known).cast("double") / col("n_chars"), 6)
        .as("other_share"): _*)
      .orderBy("source")
  }

  /** DuckDB oracle for [[scriptProfile]] on documents. */
  val scriptProfileOracleSql: String = {
    val classes = Seq(
      "latin" -> "[A-Za-z]", "digit" -> "[0-9]",
      "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
      "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
      "greek" -> "[\\x{0370}-\\x{03FF}]", "space" -> "\\s")
    val cnt = classes.map { case (n, re) =>
      s"SUM(length(text) - length(regexp_replace(text, '$re', '', 'g'))) AS c_$n"
    }.mkString(",\n  ")
    val shr = classes.map { case (n, _) =>
      s"ROUND(CAST(c_$n AS DOUBLE) / n_chars, 6) AS ${n}_share"
    }.mkString(",\n  ")
    val known = classes.map(c => s"c_${c._1}").mkString(" + ")
    s"""WITH a AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |  SUM(length(text)) AS n_chars,
       |  $cnt
       |  FROM documents GROUP BY source)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_chars AS BIGINT) AS n_chars,
       |  $shr,
       |  ROUND(CAST(n_chars - ($known) AS DOUBLE) / n_chars, 6)
       |    AS other_share
       |FROM a ORDER BY source""".stripMargin
  }
}
