package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flesch reading-ease / Flesch–Kincaid grade per document (Flesch
  * 1948; Kincaid et al. 1975) — the classic corpus-filtering signal
  * the quality-score family lacks: length/punctuation ratios (q15)
  * say "well-formed"; readability says "written for a reader", and
  * grade-level mix is a standard training-mix dashboard axis.
  *
  * The syllable count is the stated, engine-mirrored heuristic
  * syl(w) = max(1, vowel-runs(w)): total [aeiouy]+ runs over the
  * lowercased text plus one for each vowel-less token (runs never
  * span whitespace, so the corpus total equals the per-word sum).
  * Sentences = max(1, [.!?]+ runs). Everything is per-row regex
  * arithmetic — map-only, codegen'd, no shuffle at any scale; the
  * readability band classifies on the UNROUNDED score (the q230
  * lesson). */
object Readability {

  def report(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("__toks",
        expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')"))
      .withColumn("__w", size(col("__toks")).cast("bigint"))
      .withColumn("__vruns", size(expr(
        "regexp_extract_all(lower(text), '[aeiouy]+', 0)")).cast("bigint"))
      .withColumn("__novowel", size(expr(
        "filter(__toks, t -> NOT (lower(t) RLIKE '[aeiouy]'))"))
        .cast("bigint"))
      .withColumn("__syl", col("__vruns") + col("__novowel"))
      .withColumn("__s", greatest(lit(1L), size(expr(
        "regexp_extract_all(text, '[.!?]+', 0)")).cast("bigint")))
    val wd = col("__w").cast("double")
    val wps = wd / col("__s").cast("double")
    val spw = col("__syl").cast("double") / wd
    val flesch = lit(206.835) - lit(1.015) * wps - lit(84.6) * spw
    val fk = lit(0.39) * wps + lit(11.8) * spw - lit(15.59)
    d.select(
      col("doc_id"),
      col("__w").as("n_words"),
      col("__s").as("n_sentences"),
      col("__syl").as("n_syllables"),
      round(when(col("__w") > 0L, flesch)
        .otherwise(lit(null).cast("double")), 4).as("flesch"),
      round(when(col("__w") > 0L, fk)
        .otherwise(lit(null).cast("double")), 4).as("fk_grade"),
      when(col("__w") === 0L, lit("empty"))
        .when(flesch >= 60.0, lit("easy"))
        .when(flesch >= 30.0, lit("standard"))
        .otherwise(lit("difficult")).as("band"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[report]] on documents. */
  val oracleSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(str_split_regex(trim(text), '\s+'),
      |      x -> x <> '') AS toks,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vruns,
      |    len(regexp_extract_all(text, '[.!?]+')) AS sruns
      |  FROM documents),
      |k AS (
      |  SELECT doc_id,
      |    len(toks) AS w,
      |    vruns + len(list_filter(toks,
      |      x -> NOT regexp_matches(lower(x), '[aeiouy]'))) AS syl,
      |    GREATEST(1, sruns) AS s
      |  FROM t),
      |f AS (
      |  SELECT doc_id, w, s, syl,
      |    CASE WHEN w > 0 THEN 206.835
      |      - 1.015 * CAST(w AS DOUBLE) / s
      |      - 84.6 * CAST(syl AS DOUBLE) / w END AS fl,
      |    CASE WHEN w > 0 THEN 0.39 * CAST(w AS DOUBLE) / s
      |      + 11.8 * CAST(syl AS DOUBLE) / w - 15.59 END AS fk
      |  FROM k)
      |SELECT doc_id, CAST(w AS BIGINT) AS n_words,
      |  CAST(s AS BIGINT) AS n_sentences,
      |  CAST(syl AS BIGINT) AS n_syllables,
      |  ROUND(fl, 4) AS flesch,
      |  ROUND(fk, 4) AS fk_grade,
      |  CASE WHEN w = 0 THEN 'empty'
      |    WHEN fl >= 60.0 THEN 'easy'
      |    WHEN fl >= 30.0 THEN 'standard'
      |    ELSE 'difficult' END AS band
      |FROM f ORDER BY doc_id""".stripMargin
}
