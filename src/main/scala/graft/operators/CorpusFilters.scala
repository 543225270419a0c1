package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Published web-corpus filter rules as per-source audit reports —
  * the C4 heuristics (Raffel et al., JMLR 2020 §2.2) and the Gopher
  * document-quality rules (Rae et al. 2021, Table A1). The reference
  * pipeline has nothing in this family; an LLM data pipeline runs
  * exactly these rules as its first curation pass, and the AUDIT form
  * (per-source rule-hit counts, not a filtered corpus) is what a mix
  * owner reads to see WHERE each feed loses mass before committing to
  * the drop.
  *
  * Every rule is a plain substring/regex/arithmetic predicate over the
  * document — map-only, one grouped agg per report, source-cardinality
  * output, and exactly mirrorable in the DuckDB oracle (counts and
  * exact-integer ratios; no float-noise surface). */
object CorpusFilters {

  /** C4-style rule audit per source. Doc-level flags:
    *  - `n_brace`: contains `{` (code/templating bleed);
    *  - `n_lorem`: contains "lorem ipsum" (placeholder text);
    *  - `n_js`: contains "javascript" (script-warning boilerplate);
    *  - `n_policy`: cookie/privacy/terms boilerplate phrases;
    *  - `n_short`: fewer than 3 sentence terminators (C4 keeps pages
    *    of ≥ 3 sentences);
    * plus the line-level signal C4 applies before any of them:
    * `mean_line_term_share` — the average share of a doc's lines that
    * end in terminal punctuation. `n_keep` counts docs clearing every
    * doc-level flag. */
  def c4Report(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val low = lower(col(textCol))
    val brace = low.contains("{")
    val lorem = low.contains("lorem ipsum")
    val js = low.contains("javascript")
    val policy = low.contains("cookie policy") ||
      low.contains("privacy policy") || low.contains("terms of use")
    val nSent = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[.!?]", ""))
    val short = nSent < 3
    val lines = split(col(textCol), "\n")
    val termShare = size(filter(lines, l => trim(l).rlike("[.!?]$")))
      .cast("double") / size(lines)
    val f = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    docs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        f(brace).as("n_brace"),
        f(lorem).as("n_lorem"),
        f(js).as("n_js"),
        f(policy).as("n_policy"),
        f(short).as("n_short"),
        round(avg(termShare), 6).as("mean_line_term_share"),
        f(!brace && !lorem && !js && !policy && !short).as("n_keep"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[c4Report]] on documents. */
  val c4OracleSql: String =
    """WITH d AS (
      |  SELECT source,
      |    contains(lower(text), '{') AS brace,
      |    contains(lower(text), 'lorem ipsum') AS lorem,
      |    contains(lower(text), 'javascript') AS js,
      |    contains(lower(text), 'cookie policy')
      |      OR contains(lower(text), 'privacy policy')
      |      OR contains(lower(text), 'terms of use') AS policy,
      |    length(text) - length(regexp_replace(text, '[.!?]', '', 'g'))
      |      < 3 AS short,
      |    CAST(len(list_filter(str_split(text, chr(10)),
      |        l -> regexp_matches(trim(l), '[.!?]$'))) AS DOUBLE)
      |      / len(str_split(text, chr(10))) AS term_share
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  SUM(CASE WHEN brace THEN 1 ELSE 0 END) AS n_brace,
      |  SUM(CASE WHEN lorem THEN 1 ELSE 0 END) AS n_lorem,
      |  SUM(CASE WHEN js THEN 1 ELSE 0 END) AS n_js,
      |  SUM(CASE WHEN policy THEN 1 ELSE 0 END) AS n_policy,
      |  SUM(CASE WHEN short THEN 1 ELSE 0 END) AS n_short,
      |  ROUND(AVG(term_share), 6) AS mean_line_term_share,
      |  SUM(CASE WHEN NOT brace AND NOT lorem AND NOT js
      |    AND NOT policy AND NOT short THEN 1 ELSE 0 END) AS n_keep
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Gopher rules used (Rae et al. 2021, Table A1), restricted to the
    * rules whose inputs this engine computes exactly:
    *  - word count in [`minWords`, `maxWords`];
    *  - mean word length in [3, 10] characters;
    *  - ≥ 80% of words contain at least one alphabetic character;
    *  - at least 2 DISTINCT stop words from the paper's 8-word list;
    *  - most-frequent 2-gram below `maxBigramFrac` of the document
    *    (docs of < 2 words have no bigram and pass vacuously).
    * Output per source: fail counts per rule and `n_pass` (docs
    * failing none). */
  def gopherReport(docs: DataFrame, textCol: String = "text",
      minWords: Long = 50L, maxWords: Long = 100000L,
      maxBigramFrac: Double = 0.2): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have",
      "with")
    val toks = TextFunctions.tokens(col(textCol))
    val staged = docs
      .withColumn("__toks", toks)
      .withColumn("__p",
        graft.functions.RepetitionProfile.repetitionProfile(col("__toks")))
    val n = col("__p.n_tokens")
    val meanLen = TextFunctions.sumTokenLenT(col("__toks")).cast("double") /
      n.cast("double")
    val alphaFrac = size(filter(col("__toks"), t => t.rlike("[A-Za-z]")))
      .cast("double") / n.cast("double")
    val stopDistinct =
      size(array_intersect(col("__toks"), array(stops.map(lit): _*)))
    val bigramFrac = col("__p.top_bigram_n").cast("double") / (n - 1.0)
    val fWords = n < minWords || n > maxWords
    val fLen = !(meanLen >= 3.0 && meanLen <= 10.0)
    val fAlpha = alphaFrac < 0.8
    val fStop = stopDistinct < 2
    val fRep = n >= 2 && bigramFrac > maxBigramFrac
    val f = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    staged
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        f(fWords).as("fail_word_count"),
        f(fLen).as("fail_mean_word_len"),
        f(fAlpha).as("fail_alpha_share"),
        f(fStop).as("fail_stopwords"),
        f(fRep).as("fail_top_bigram"),
        f(!fWords && !fLen && !fAlpha && !fStop && !fRep).as("n_pass"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[gopherReport]] on documents (default
    * thresholds). The top-bigram mass is replayed exactly as the q71
    * oracle does, reduced to its max count. */
  val gopherOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    list_filter(str_split_regex(trim(text), '\s+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, MAX(cnt) AS top_n FROM (
      |    SELECT doc_id, gram, COUNT(*) AS cnt FROM (
      |      SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |        i -> toks[i] || ' ' || toks[i + 1])) AS gram
      |      FROM t WHERE len(toks) >= 2)
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |d AS (
      |  SELECT t.source,
      |    len(toks) AS n,
      |    CAST(list_sum(list_transform(toks, x -> length(x)))
      |      AS DOUBLE) / len(toks) AS mean_len,
      |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
      |      AS DOUBLE) / len(toks) AS alpha_frac,
      |    len(list_intersect(list_distinct(toks),
      |      ['the','be','to','of','and','that','have','with']))
      |      AS stop_distinct,
      |    CAST(COALESCE(g.top_n, 0) AS DOUBLE) / (len(toks) - 1.0)
      |      AS bigram_frac
      |  FROM t LEFT JOIN grams g USING (doc_id)),
      |fl AS (
      |  SELECT source,
      |    n < 50 OR n > 100000 AS f_words,
      |    NOT (mean_len >= 3.0 AND mean_len <= 10.0) AS f_len,
      |    alpha_frac < 0.8 AS f_alpha,
      |    stop_distinct < 2 AS f_stop,
      |    n >= 2 AND bigram_frac > 0.2 AS f_rep
      |  FROM d)
      |SELECT source, COUNT(*) AS n_docs,
      |  SUM(CASE WHEN f_words THEN 1 ELSE 0 END) AS fail_word_count,
      |  SUM(CASE WHEN f_len THEN 1 ELSE 0 END) AS fail_mean_word_len,
      |  SUM(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS fail_alpha_share,
      |  SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS fail_stopwords,
      |  SUM(CASE WHEN f_rep THEN 1 ELSE 0 END) AS fail_top_bigram,
      |  SUM(CASE WHEN NOT f_words AND NOT f_len AND NOT f_alpha
      |    AND NOT f_stop AND NOT f_rep THEN 1 ELSE 0 END) AS n_pass
      |FROM fl GROUP BY source ORDER BY source""".stripMargin

  /** Cross-document duplicate-LINE audit (the line-wise dedup pass of
    * CCNet / RefinedWeb: headers, nav bars, and cookie banners repeat
    * VERBATIM across pages of a site long before whole documents
    * collide). A line is boilerplate when its exact trimmed text
    * occurs in ≥ `minDocs` distinct documents; the report shows per
    * source how much line- and character-mass that removes —
    * complementary to [[graft.operators.SegmentDedup.boilerplateExcise]],
    * which works at sub-line token-segment grain within one source.
    *
    * Scale shape: explode to lines, ONE distinct + group on the line
    * key for document counts, one join back. At corpus scale the join
    * key would be xxhash64(line) riding an 8-byte shuffle (the q130
    * spill-mode precedent); the oracled form keys on the raw trimmed
    * line so DuckDB replays it exactly. */
  def lineDedup(docs: DataFrame, textCol: String = "text",
      minDocs: Int = 3): DataFrame = {
    val lines = docs
      .select(col("source"), col("doc_id"),
        explode(split(col(textCol), "\n")).as("__raw"))
      .withColumn("__line", trim(col("__raw")))
      .where(length(col("__line")) > 0)
    val perLine = lines.select(col("__line"), col("doc_id")).distinct()
      .groupBy("__line")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__line"), lit(true).as("__boiler"))
    lines
      .join(perLine, Seq("__line"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__boiler"), 1L).otherwise(0L)).as("n_boiler_lines"),
        sum(length(col("__line")).cast("bigint")).as("n_chars"),
        sum(when(col("__boiler"), length(col("__line")).cast("bigint"))
          .otherwise(0L)).as("__bc"))
      .select(col("source"), col("n_lines"), col("n_boiler_lines"),
        round(col("n_boiler_lines").cast("double") / col("n_lines"), 6)
          .as("boiler_line_share"),
        col("n_chars"),
        round(col("__bc").cast("double") / col("n_chars"), 6)
          .as("boiler_char_share"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[lineDedup]] on documents (minDocs = 3). */
  val lineDedupOracleSql: String =
    """WITH lines AS (
      |  SELECT source, doc_id, trim(l) AS line
      |  FROM (SELECT source, doc_id, unnest(str_split(text, chr(10)))
      |    AS l FROM documents)
      |  WHERE length(trim(l)) > 0),
      |boiler AS (
      |  SELECT line FROM (
      |    SELECT line, COUNT(DISTINCT doc_id) AS nd
      |    FROM lines GROUP BY 1)
      |  WHERE nd >= 3)
      |SELECT source, COUNT(*) AS n_lines,
      |  SUM(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END)
      |    AS n_boiler_lines,
      |  ROUND(CAST(SUM(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*), 6) AS boiler_line_share,
      |  SUM(length(lines.line)) AS n_chars,
      |  ROUND(CAST(SUM(CASE WHEN b.line IS NOT NULL
      |      THEN length(lines.line) ELSE 0 END) AS DOUBLE)
      |    / SUM(length(lines.line)), 6) AS boiler_char_share
      |FROM lines LEFT JOIN boiler b USING (line)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Gopher LINE-level rules (Rae et al. 2021 Table A1, the two rules
    * [[gopherReport]]'s word-level pass can't see): drop a doc when
    * ≥ 90% of its lines start with a bullet, or ≥ 30% end with an
    * ellipsis. Reported per source with the mean shares, map-only. */
  def lineRules(docs: DataFrame, textCol: String = "text",
      maxBulletShare: Double = 0.9,
      maxEllipsisShare: Double = 0.3): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    val nl = size(lines)
    val bullet = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .cast("double") / nl
    val ellip = size(filter(lines, l => l.endsWith("...")))
      .cast("double") / nl
    val staged = docs
      .withColumn("__bs", bullet).withColumn("__es", ellip)
      .where(nl > 0)
    val f = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    staged.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        f(col("__bs") >= maxBulletShare).as("fail_bullet"),
        f(col("__es") >= maxEllipsisShare).as("fail_ellipsis"),
        round(avg("__bs"), 6).as("mean_bullet_share"),
        round(avg("__es"), 6).as("mean_ellipsis_share"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[lineRules]] on documents (defaults). */
  val lineRulesOracleSql: String =
    """WITH d AS (
      |  SELECT source,
      |    list_filter(list_transform(str_split(text, chr(10)),
      |      l -> trim(l)), l -> length(l) > 0) AS ls
      |  FROM documents),
      |s AS (
      |  SELECT source,
      |    CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%'
      |      OR l LIKE chr(8226) || '%')) AS DOUBLE) / len(ls) AS bs,
      |    CAST(len(list_filter(ls, l -> l LIKE '%...')) AS DOUBLE)
      |      / len(ls) AS es
      |  FROM d WHERE len(ls) > 0)
      |SELECT source, COUNT(*) AS n_docs,
      |  SUM(CASE WHEN bs >= 0.9 THEN 1 ELSE 0 END) AS fail_bullet,
      |  SUM(CASE WHEN es >= 0.3 THEN 1 ELSE 0 END) AS fail_ellipsis,
      |  ROUND(AVG(bs), 6) AS mean_bullet_share,
      |  ROUND(AVG(es), 6) AS mean_ellipsis_share
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  /** Encoding-health audit per source (the mojibake pass every
    * web-crawl pipeline runs before language ID — wrongly-decoded
    * bytes poison tokenizers and n-gram stats silently): docs
    * containing U+FFFD replacement characters (a decoder already
    * gave up), docs with C0 control characters other than tab/
    * newline/CR (binary bleed), and the mean non-ASCII character
    * share (the dial that separates "French" from "double-decoded
    * UTF-8"). Map-only regex + one grouped agg; patterns stay in the
    * RE2 ∩ Java-regex common syntax so both engines match the same
    * characters. */
  /** Per-document mojibake flags — the map-only kernel shared by
    * [[encodingAudit]] and the streaming corpus-health monitor
    * ([[graft.streaming.CorpusHealth]]), so stream ≡ batch holds by
    * construction. */
  def encodingFlags(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nonAscii = length(regexp_replace(t, "[\\x00-\\x7F]", ""))
    docs
      .withColumn("__repl", t.contains("�"))
      .withColumn("__ctrl",
        t.rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
      .withColumn("__nas",
        when(length(t) > 0,
          nonAscii.cast("double") / length(t)).otherwise(0.0))
  }

  def encodingAudit(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val f = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    encodingFlags(docs, textCol)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        f(col("__repl")).as("n_replacement"),
        f(col("__ctrl")).as("n_control"),
        round(avg("__nas"), 6).as("mean_non_ascii_share"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[encodingAudit]] on documents. */
  val encodingAuditOracleSql: String =
    """WITH d AS (
      |  SELECT source,
      |    contains(text, chr(65533)) AS repl,
      |    regexp_matches(text,
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F]') AS ctrl,
      |    CASE WHEN length(text) > 0
      |      THEN CAST(length(regexp_replace(text, '[\x00-\x7F]', '',
      |        'g')) AS DOUBLE) / length(text)
      |      ELSE 0.0 END AS nas
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  SUM(CASE WHEN repl THEN 1 ELSE 0 END) AS n_replacement,
      |  SUM(CASE WHEN ctrl THEN 1 ELSE 0 END) AS n_control,
      |  ROUND(AVG(nas), 6) AS mean_non_ascii_share
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Duplicate-aware soft weighting (the SoftDeDup idea — He et al.
    * 2024 — reduced to its exact-duplicate core): instead of DROPPING
    * copies, every member of an exact-duplicate cluster of size c
    * gets sampling weight 1/c, so each distinct text contributes unit
    * mass. The per-source report shows raw count vs effective mass —
    * the honest size of each feed after duplicate discounting, and
    * the input the mix-rebalancer ([[doremiTilt]], q66 mix report)
    * should consume instead of raw counts.
    *
    * The cluster key is the whitespace-normalized lowercased text
    * (q14's exact-dedup normalization); one group + one join back,
    * both on the normalized key. */
  def softDedupWeights(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val key = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val keyed = docs.select(col("source"), key.as("__k"))
    val clusters = keyed.groupBy("__k")
      .agg(count(lit(1)).as("__c"))
    keyed.join(clusters, "__k")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(lit(1.0) / col("__c")), 6).as("effective_mass"))
      .select(col("source"), col("n_docs"), col("effective_mass"),
        round(lit(1.0) - col("effective_mass") /
          col("n_docs").cast("double"), 6).as("dup_discount"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[softDedupWeights]] on documents. */
  val softDedupOracleSql: String =
    """WITH keyed AS (
      |  SELECT source,
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS k
      |  FROM documents),
      |cl AS (SELECT k, COUNT(*) AS c FROM keyed GROUP BY 1)
      |SELECT source, COUNT(*) AS n_docs,
      |  ROUND(SUM(1.0 / c), 6) AS effective_mass,
      |  ROUND(1.0 - SUM(1.0 / c) / COUNT(*), 6) AS dup_discount
      |FROM keyed JOIN cl USING (k)
      |GROUP BY source ORDER BY source""".stripMargin

  /** DoReMi-style domain reweighting as one exponential-tilting step
    * (Xie et al., NeurIPS 2023 reduce to multiplicative weights over
    * per-domain excess loss; with a FIXED per-domain score the update
    * has this closed form): `w_d ∝ base_share_d · exp(η · s_d)`,
    * normalized. The score here is each source's mean heuristic
    * quality (the oracled q137 scorer) — domains that read better get
    * upweighted, with η the aggressiveness dial. Output per source:
    * `(source, n_docs, base_share, mean_quality, weight, uplift)`.
    *
    * One corpus pass for the per-doc score (map-only arithmetic), one
    * grouped agg, then |sources|-row math with a 1-row normalizer. */
  def doremiTilt(docs: DataFrame, eta: Double = 2.0,
      textCol: String = "text"): DataFrame = {
    val scored = docs.select(col("source"),
      TextFunctions.qualityScore(col(textCol)).as("__q"))
    val bySrc = scored.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), avg("__q").as("__mq"))
    val tot = bySrc.agg(sum("n_docs").as("__N"))
    val tilted = bySrc.crossJoin(broadcast(tot))   // 1-row stat factor
      .withColumn("__share",
        col("n_docs").cast("double") / col("__N"))
      .withColumn("__raw", col("__share") * exp(col("__mq") * eta))
    val z = tilted.agg(sum("__raw").as("__Z"))
    tilted.crossJoin(broadcast(z))   // 1-row stat factor
      .select(
        col("source"),
        col("n_docs").cast("bigint").as("n_docs"),
        round(col("__share"), 6).as("base_share"),
        round(col("__mq"), 6).as("mean_quality"),
        round(col("__raw") / col("__Z"), 6).as("weight"),
        round(col("__raw") / col("__Z") / col("__share"), 6).as("uplift"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[doremiTilt]] on documents (η = 2). */
  val doremiOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    str_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, source,
      |    CAST(len(toks) AS DOUBLE) AS n,
      |    CAST(list_sum(list_transform(toks, x -> length(x)))
      |      AS DOUBLE) AS sl,
      |    CAST(list_sum(list_transform(toks, x -> CASE WHEN x IN
      |      ('the','a','of','and','to','in','is','on',
      |       'der','die','das','und','ist','nicht','ein','zu',
      |       'el','la','de','que','y','en','un','es',
      |       'le','et','les','des','est','une') THEN 1 ELSE 0 END))
      |      AS DOUBLE) AS st
      |  FROM t),
      |q AS (
      |  SELECT source, ROUND(
      |    LEAST(n / 16.0, 1.0) * 0.4 +
      |    (CASE WHEN sl / n BETWEEN 2.0 AND 9.0 THEN 1.0 ELSE 0.5 END)
      |      * 0.4 +
      |    LEAST(st / n * 4.0, 1.0) * 0.2, 4) AS quality
      |  FROM s),
      |bysrc AS (
      |  SELECT source, COUNT(*) AS n_docs, AVG(quality) AS mq
      |  FROM q GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS nn FROM bysrc),
      |tilted AS (
      |  SELECT source, n_docs,
      |    CAST(n_docs AS DOUBLE) / tot.nn AS share,
      |    mq,
      |    CAST(n_docs AS DOUBLE) / tot.nn *
      |      exp(mq * CAST(2.0 AS DOUBLE)) AS raw
      |  FROM bysrc, tot),
      |z AS (SELECT SUM(raw) AS zz FROM tilted)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  ROUND(share, 6) AS base_share,
      |  ROUND(mq, 6) AS mean_quality,
      |  ROUND(raw / z.zz, 6) AS weight,
      |  ROUND(raw / z.zz / share, 6) AS uplift
      |FROM tilted, z ORDER BY source""".stripMargin

  /** WITHIN-document n-gram repetition audit (the `dup_5gram` member
    * of Gopher's repetition-filter family, Rae et al. 2021 §A1.1 —
    * distinct from [[gopherReport]]'s TOP-bigram mass, which catches
    * one dominating phrase, and from [[lineDedup]]'s CROSS-document
    * boilerplate): a looping generator or scraped spam repeats whole
    * 5-grams inside one document, so the duplicated-5-gram share
    * 1 − |distinct 5-grams|/|5-grams| is the cheap per-doc tell.
    * Token-share variant of the paper's character-fraction metric
    * (documented choice: char-weighting needs per-occurrence
    * attribution; the token share is the same signal map-side).
    *
    * One row per source: `(source, n_docs, mean_dup5_share,
    * max_dup5_share, n_fail)` over docs with ≥ 5 tokens, fail at
    * share > 0.15. Scale shape: MAP-ONLY per doc (array ops, no
    * explode, no shuffle beyond the |sources|-row final group) — the
    * cheapest possible plan for a corpus-wide filter. */
  def intradocRepetition(docs: DataFrame, textCol: String = "text",
      maxDupShare: Double = 0.15): DataFrame = {
    val staged = docs
      .withColumn("__toks",
        filter(TextFunctions.tokens(col(textCol)), t => t =!= ""))
      .where(size(col("__toks")) >= 5)
      .withColumn("__grams", expr(
        "transform(sequence(1, size(__toks) - 4), " +
          "i -> concat_ws(' ', slice(__toks, i, 5)))"))
      .withColumn("__share", lit(1.0) -
        size(array_distinct(col("__grams"))).cast("double") /
          size(col("__grams")).cast("double"))
    staged.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("__share"), 6).as("mean_dup5_share"),
        round(max("__share"), 6).as("max_dup5_share"),
        sum(when(col("__share") > maxDupShare, 1L).otherwise(0L))
          .as("n_fail"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[intradocRepetition]] (default threshold). */
  val intradocRepetitionOracleSql: String =
    """WITH t AS (
      |  SELECT source,
      |    list_filter(str_split_regex(trim(text), '\s+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |g AS (
      |  SELECT source,
      |    list_transform(range(1, len(toks) - 3),
      |      i -> array_to_string(toks[i:i+4], ' ')) AS grams
      |  FROM t WHERE len(toks) >= 5),
      |d AS (
      |  SELECT source,
      |    1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
      |      AS share
      |  FROM g)
      |SELECT source, COUNT(*) AS n_docs,
      |  ROUND(AVG(share), 6) AS mean_dup5_share,
      |  ROUND(MAX(share), 6) AS max_dup5_share,
      |  CAST(SUM(CASE WHEN share > 0.15 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_fail
      |FROM d GROUP BY source ORDER BY source""".stripMargin
}
