package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-comparison lexical statistics — the "which WORDS make these
  * two corpora different" tier beside the corpus-LEVEL divergences
  * (q234 lexical KL, q237 JS): per-token keyness by Dunning's
  * log-likelihood ratio (Dunning, Comp. Ling. 1993), the shrunken
  * log-odds of Monroe–Colaresi–Quinn "Fightin' Words" (Political
  * Analysis 2008), and collocation extraction by PMI + t-score
  * (Church & Hanks, Comp. Ling. 1990; Manning & Schütze ch. 5).
  * These are the standard instruments for auditing what a data-mix
  * change actually changed, finding contamination shibboleths, and
  * building phrase vocabularies.
  *
  * Scale shape (all three): one explode to the token/bigram stream
  * with map-side-combined counting into the VOCABULARY-bounded count
  * table; corpus totals are 1-row broadcast stat factors; everything
  * after the first agg runs at vocab (not corpus) cardinality, and
  * the output is a top-k ordered limit. Ranking keys are rounded to
  * 6 decimals BEFORE the sort with a lexicographic token tiebreak, so
  * the cut is FP-stable across engines (the q270 breakpoint
  * precedent). */
object Keyness {

  /** Per-token Dunning G² between corpus A (`inA`) and the rest:
    * `(token, cnt_a, cnt_b, llr, enriched_in_a)`, top `topK` by
    * rounded G² (ties → token order). G² = 2·Σ O·ln(O/E) over the
    * 2-cell token row (zero cells contribute 0); `enriched_in_a`
    * compares the EXACT integer cross products a·N_b > b·N_a, so the
    * flag cannot float-flip between engines. Tokens below `minCount`
    * total occurrences are dropped (keyness on hapaxes is noise). */
  def dunningLlr(docs: DataFrame, inA: Column, minCount: Long = 5L,
      topK: Int = 40): DataFrame = {
    val cnt = docs
      .select(inA.as("__a"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("cnt_b"))
    val tot = cnt.agg(sum("cnt_a").as("__na"), sum("cnt_b").as("__nb"))
    val j = cnt.where(col("cnt_a") + col("cnt_b") >= minCount)
      .crossJoin(broadcast(tot))   // 1-row stat factor
    val nD = (col("__na") + col("__nb")).cast("double")
    val rowTot = (col("cnt_a") + col("cnt_b")).cast("double")
    val ea = col("__na").cast("double") * rowTot / nD
    val eb = col("__nb").cast("double") * rowTot / nD
    def term(o: Column, e: Column): Column =
      when(o > 0L, o.cast("double") * log(o.cast("double") / e))
        .otherwise(lit(0.0))
    val g2 = (term(col("cnt_a"), ea) + term(col("cnt_b"), eb)) * 2.0
    j.select(col("token"), col("cnt_a"), col("cnt_b"),
        round(g2, 6).as("llr"),
        (col("cnt_a") * col("__nb") > col("cnt_b") * col("__na"))
          .as("enriched_in_a"))
      .orderBy(col("llr").desc, col("token"))
      .limit(topK)
  }

  /** DuckDB oracle for the registered Dunning fixture (A = lang
    * 'en'). */
  def dunningOracleSql(minCount: Long = 5L, topK: Int = 40): String =
    s"""WITH tok AS (
       |  SELECT lang = 'en' AS a,
       |    unnest(str_split_regex(trim(text), '\\s+')) AS token
       |  FROM documents),
       |cnt AS (
       |  SELECT token,
       |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS cnt_a,
       |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS cnt_b
       |  FROM tok WHERE token <> '' GROUP BY 1),
       |tot AS (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM cnt),
       |f AS (
       |  SELECT token, cnt_a, cnt_b, na, nb,
       |    CAST(na + nb AS DOUBLE) AS n,
       |    CAST(cnt_a + cnt_b AS DOUBLE) AS rt
       |  FROM cnt CROSS JOIN tot
       |  WHERE cnt_a + cnt_b >= $minCount),
       |g AS (
       |  SELECT token, cnt_a, cnt_b, na, nb,
       |    ((CASE WHEN cnt_a > 0 THEN cnt_a * LN(cnt_a /
       |        (CAST(na AS DOUBLE) * rt / n)) ELSE 0.0 END) +
       |     (CASE WHEN cnt_b > 0 THEN cnt_b * LN(cnt_b /
       |        (CAST(nb AS DOUBLE) * rt / n)) ELSE 0.0 END)) * 2.0
       |      AS g2
       |  FROM f)
       |SELECT token, CAST(cnt_a AS BIGINT) AS cnt_a,
       |  CAST(cnt_b AS BIGINT) AS cnt_b,
       |  ROUND(g2, 6) AS llr,
       |  cnt_a * nb > cnt_b * na AS enriched_in_a
       |FROM g ORDER BY ROUND(g2, 6) DESC, token LIMIT $topK""".stripMargin

  /** Per-token shrunken log-odds z-scores between corpus A and the
    * rest (Monroe–Colaresi–Quinn 2008, the informative-Dirichlet
    * model): δ_w = logit difference under an α₀-strength prior
    * proportional to the pooled token frequency, z_w = δ_w/σ_w with
    * σ²_w ≈ 1/(a+α_w) + 1/(b+α_w). The prior SHRINKS rare-word odds
    * toward zero — the fix for raw log-odds exploding on hapaxes —
    * so the top of this list is "confidently different", not merely
    * "rare". Top `topK` by rounded |z| (ties → token), columns
    * `(token, cnt_a, cnt_b, delta, z)`. */
  def monroeLogOdds(docs: DataFrame, inA: Column, alpha0: Double = 500.0,
      minCount: Long = 5L, topK: Int = 40): DataFrame = {
    val cnt = docs
      .select(inA.as("__a"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("cnt_b"))
    val tot = cnt.agg(sum("cnt_a").as("__na"), sum("cnt_b").as("__nb"))
    val j = cnt.where(col("cnt_a") + col("cnt_b") >= minCount)
      .crossJoin(broadcast(tot))   // 1-row stat factor
    val nD = (col("__na") + col("__nb")).cast("double")
    val aw = lit(alpha0) * (col("cnt_a") + col("cnt_b")).cast("double") / nD
    val aD = col("cnt_a").cast("double") + aw
    val bD = col("cnt_b").cast("double") + aw
    val naD = col("__na").cast("double") + alpha0
    val nbD = col("__nb").cast("double") + alpha0
    val delta = log(aD / (naD - aD)) - log(bD / (nbD - bD))
    val z = delta / sqrt(lit(1.0) / aD + lit(1.0) / bD)
    j.select(col("token"), col("cnt_a"), col("cnt_b"),
        round(delta, 6).as("delta"),
        round(z, 6).as("z"))
      .orderBy(abs(round(z, 6)).desc, col("token"))
      .limit(topK)
  }

  /** DuckDB oracle for the registered Monroe fixture (A = lang 'en',
    * α₀ = 500). */
  def monroeOracleSql(alpha0: Double = 500.0, minCount: Long = 5L,
      topK: Int = 40): String =
    s"""WITH tok AS (
       |  SELECT lang = 'en' AS a,
       |    unnest(str_split_regex(trim(text), '\\s+')) AS token
       |  FROM documents),
       |cnt AS (
       |  SELECT token,
       |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS cnt_a,
       |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS cnt_b
       |  FROM tok WHERE token <> '' GROUP BY 1),
       |tot AS (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM cnt),
       |f AS (
       |  SELECT token, cnt_a, cnt_b,
       |    cnt_a + $alpha0 * CAST(cnt_a + cnt_b AS DOUBLE) /
       |      (na + nb) AS ad,
       |    cnt_b + $alpha0 * CAST(cnt_a + cnt_b AS DOUBLE) /
       |      (na + nb) AS bd,
       |    CAST(na AS DOUBLE) + $alpha0 AS nad,
       |    CAST(nb AS DOUBLE) + $alpha0 AS nbd
       |  FROM cnt CROSS JOIN tot
       |  WHERE cnt_a + cnt_b >= $minCount),
       |g AS (
       |  SELECT token, cnt_a, cnt_b,
       |    LN(ad / (nad - ad)) - LN(bd / (nbd - bd)) AS delta,
       |    (LN(ad / (nad - ad)) - LN(bd / (nbd - bd))) /
       |      SQRT(1.0 / ad + 1.0 / bd) AS z
       |  FROM f)
       |SELECT token, CAST(cnt_a AS BIGINT) AS cnt_a,
       |  CAST(cnt_b AS BIGINT) AS cnt_b,
       |  ROUND(delta, 6) AS delta, ROUND(z, 6) AS z
       |FROM g ORDER BY ABS(ROUND(z, 6)) DESC, token
       |LIMIT $topK""".stripMargin

  /** Bigram collocations by pointwise mutual information with the
    * t-score significance companion: PMI = ln(p(xy)/(p(x)p(y)))
    * finds STRENGTH of association (but top-ranks rare pairs),
    * t = (c(xy) − E)/√c(xy) finds CONFIDENCE (but top-ranks frequent
    * pairs) — reading both is the standard recipe. `minCount` floors
    * the bigram count. Top `topK` by rounded PMI (ties → bigram
    * order), columns `(w1, w2, cnt, pmi, t_score)`.
    *
    * The token array is STAGED once per document before the two
    * slice lambdas (the expression-CSE rule — N lambdas over an
    * unstaged array re-tokenize N times). */
  def collocations(docs: DataFrame, minCount: Long = 5L,
      topK: Int = 40): DataFrame = {
    val staged = docs
      .withColumn("__toks", TextFunctions.tokens(col("text")))
      .where(size(col("__toks")) >= 2)
    val bigrams = staged.select(explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .where(col("w1") =!= "" && col("w2") =!= "")
    val cBig = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val uni = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val tot = cBig.agg(sum("cnt").as("__nbi"))
      .crossJoin(uni.agg(sum("cw").as("__nuni")))
    val j = cBig.where(col("cnt") >= minCount)
      .join(uni.withColumnRenamed("w", "w1")
        .withColumnRenamed("cw", "__c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("cw", "__c2"), "w2")
      .crossJoin(broadcast(tot))   // 1-row stat factor
    val px = col("__c1").cast("double") / col("__nuni")
    val py = col("__c2").cast("double") / col("__nuni")
    val pxy = col("cnt").cast("double") / col("__nbi")
    val e = col("__nbi").cast("double") * px * py
    j.select(col("w1"), col("w2"), col("cnt"),
        round(log(pxy / (px * py)), 6).as("pmi"),
        round((col("cnt").cast("double") - e) /
          sqrt(col("cnt").cast("double")), 6).as("t_score"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** DuckDB oracle for [[collocations]] over documents. */
  def collocationsOracleSql(minCount: Long = 5L, topK: Int = 40): String =
    s"""WITH t AS (
       |  SELECT doc_id, str_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |u AS (
       |  SELECT doc_id, unnest(toks) AS w,
       |    generate_subscripts(toks, 1) AS i
       |  FROM t),
       |uni AS (
       |  SELECT w, COUNT(*) AS cw FROM u WHERE w <> '' GROUP BY 1),
       |bg AS (
       |  SELECT a.w AS w1, b.w AS w2
       |  FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       |  WHERE a.w <> '' AND b.w <> ''),
       |cb AS (SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
       |tot AS (
       |  SELECT (SELECT SUM(cnt) FROM cb) AS nbi,
       |    (SELECT SUM(cw) FROM uni) AS nuni),
       |j AS (
       |  SELECT cb.w1, cb.w2, cb.cnt,
       |    u1.cw AS c1, u2.cw AS c2, tot.nbi, tot.nuni
       |  FROM cb
       |  JOIN uni u1 ON cb.w1 = u1.w
       |  JOIN uni u2 ON cb.w2 = u2.w
       |  CROSS JOIN tot
       |  WHERE cb.cnt >= $minCount),
       |g AS (
       |  SELECT w1, w2, cnt,
       |    LN((CAST(cnt AS DOUBLE) / nbi) /
       |      ((CAST(c1 AS DOUBLE) / nuni) *
       |       (CAST(c2 AS DOUBLE) / nuni))) AS pmi,
       |    (CAST(cnt AS DOUBLE) - CAST(nbi AS DOUBLE) *
       |      (CAST(c1 AS DOUBLE) / nuni) *
       |      (CAST(c2 AS DOUBLE) / nuni)) /
       |      SQRT(CAST(cnt AS DOUBLE)) AS ts
       |  FROM j)
       |SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt,
       |  ROUND(pmi, 6) AS pmi, ROUND(ts, 6) AS t_score
       |FROM g ORDER BY ROUND(pmi, 6) DESC, w1, w2
       |LIMIT $topK""".stripMargin

  /** Burrows' Delta stylometric distance between every source pair
    * (Burrows, LLC 2002; Argamon's probabilistic reading, LLC 2008):
    * z-score each of the `topKWords` most frequent words' relative
    * frequencies ACROSS sources, then Delta(s₁,s₂) = mean |z₁ − z₂|.
    * The standard authorship/style distance — two sources scraped
    * from the same template read near-0 even when their topics (and
    * hence [[dunningLlr]] keyness) differ; the mixture-audit
    * complement to content divergence. Word selection is by integer
    * total count with a token tiebreak — no float in the cut.
    *
    * Scale shape: one (source × token) grouped count, a vocab-bounded
    * top-k, the COMPLETE |S|·k cell grid (missing cells are true
    * zeros, not dropped rows), per-word moment rows, and the |S|²
    * pair join — everything after the first agg is source/vocab
    * cardinality. Rows `(src_a, src_b, n_words, delta)` for
    * src_a < src_b, ordered. */
  def burrowsDelta(docs: DataFrame, topKWords: Int = 30): DataFrame = {
    val cnt = docs
      .select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val perSrc = cnt.groupBy("source").agg(sum("c").as("n_s"))
    val topWords = cnt.groupBy("token").agg(sum("c").as("__tot"))
      .orderBy(col("__tot").desc, col("token"))
      .limit(topKWords).select("token")
    val grid = perSrc.crossJoin(broadcast(topWords))   // |S|·k cells
      .join(cnt, Seq("source", "token"), "left_outer")
      .select(col("source"), col("token"),
        (coalesce(col("c"), lit(0L)).cast("double") / col("n_s"))
          .as("f"))
    val wStats = grid.groupBy("token").agg(
      avg("f").as("__mu"), stddev_pop(col("f")).as("__sd"))
    val z = grid.join(wStats, "token")
      .where(col("__sd") > 0.0)
      .select(col("source"), col("token"),
        ((col("f") - col("__mu")) / col("__sd")).as("z"))
    val l = z.select(col("source").as("src_a"), col("token"),
      col("z").as("za"))
    val r = z.select(col("source").as("src_b"), col("token"),
      col("z").as("zb"))
    l.join(r, "token")
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_words"),
        round(avg(abs(col("za") - col("zb"))), 6).as("delta"))
      .orderBy("src_a", "src_b")
  }

  /** DuckDB oracle for [[burrowsDelta]] over documents. */
  def burrowsOracleSql(topKWords: Int = 30): String =
    s"""WITH tok AS (
       |  SELECT source,
       |    unnest(str_split_regex(trim(text), '\\s+')) AS token
       |  FROM documents),
       |cnt AS (
       |  SELECT source, token, COUNT(*) AS c
       |  FROM tok WHERE token <> '' GROUP BY 1, 2),
       |per_src AS (
       |  SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
       |topw AS (
       |  SELECT token FROM (
       |    SELECT token, SUM(c) AS tot FROM cnt GROUP BY 1)
       |  ORDER BY tot DESC, token LIMIT $topKWords),
       |grid AS (
       |  SELECT p.source, t.token,
       |    COALESCE(cnt.c, 0) / CAST(p.n_s AS DOUBLE) AS f
       |  FROM per_src p CROSS JOIN topw t
       |  LEFT JOIN cnt ON cnt.source = p.source
       |    AND cnt.token = t.token),
       |ws AS (
       |  SELECT token, AVG(f) AS mu, STDDEV_POP(f) AS sd
       |  FROM grid GROUP BY 1),
       |z AS (
       |  SELECT g.source, g.token, (g.f - ws.mu) / ws.sd AS z
       |  FROM grid g JOIN ws ON g.token = ws.token
       |  WHERE ws.sd > 0.0)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  ROUND(AVG(ABS(a.z - b.z)), 6) AS delta
       |FROM z a JOIN z b ON a.token = b.token
       |  AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
