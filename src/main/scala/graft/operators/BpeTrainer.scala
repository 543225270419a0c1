package graft.operators

import graft.util.Checkpoints.TruncateOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed byte-pair-encoding vocabulary TRAINING (Sennrich,
  * Haddow & Birch, ACL 2016) — the step that turns [[Vocab]]'s counting
  * pass into an actual subword tokenizer. The reference pipeline stops
  * at token counting; an LLM data pipeline also has to FIT the
  * tokenizer on its own corpus.
  *
  * Scale shape — the textbook algorithm is corpus-quadratic if run
  * naively; the distributed form works entirely on the DISTINCT-WORD
  * table:
  *   - one explode + hash-agg builds (word, freq) — the only pass over
  *     the corpus; Zipf bounds the distinct-word table at orders of
  *     magnitude below corpus size (the same argument as [[Vocab]]);
  *   - each merge round is a map-side adjacent-pair explode over that
  *     table, weighted by `freq`, into a partial-aggregated top-1 —
  *     shuffle rows are bounded by distinct PAIRS, not words;
  *   - the chosen merge applies as one codegen'd `regexp_replace` over
  *     the symbol string — map-only, no shuffle;
  *   - driver state is the merge list itself (`numMerges` entries) and
  *     one top-1 row per round — nothing corpus-sized.
  * Rounds are O(numMerges) small Spark jobs; `localCheckpoint` per
  * round keeps the plan from growing a `regexp_replace` tower (lineage
  * depth, not data, would otherwise dominate planning time).
  *
  * Symbols are kept as a U+0001-separated string with a leading and
  * trailing separator. A merge (L, R) rewrites `␁L␁R(?=␁)` → `␁LR`:
  * the trailing separator is matched by LOOKAHEAD, not consumed, so
  * the scan can reuse it as the next match's leading boundary —
  * exactly the greedy left-to-right non-overlapping semantics of
  * textbook BPE ("aaaa" with merge (a,a) → "aa aa", "aaa" → "aa a").
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  private[operators] val Sep = "\u0001"  // U+0001, never in real text
  val EndWord = "</w>"

  /** Padded symbol string for one word column: `␁c1␁c2␁…␁</w>␁`.
    * Characters equal to the separator itself are stripped defensively
    * (they cannot occur in real text; one control char must not
    * corrupt the symbol framing). */
  private def padSyms(word: Column): Column =
    concat(lit(Sep),
      concat_ws(Sep,
        concat(
          filter(split(word, ""), c => c =!= "" && c =!= Sep),
          array(lit(EndWord)))),
      lit(Sep))

  /** Distinct-word working table: (syms, freq), one corpus pass. */
  private[operators] def wordTable(docs: DataFrame,
      textCol: String): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(padSyms(col("word")).as("syms"), col("freq"))

  /** Adjacent-pair counts of a padded-symbol table, `freq`-weighted:
    * the per-round aggregate. Split of the padded string yields empty
    * edge tokens, which the sequence bounds skip (element 1 .. n-2 of
    * the raw split are the real symbols). */
  private def pairCounts(words: DataFrame): DataFrame = {
    val arr = filter(split(col("syms"), Sep), c => c =!= "")
    words
      .select(explode(when(size(arr) >= 2,
          transform(sequence(lit(0), size(arr) - 2),
            k => concat(element_at(arr, k + 1), lit(Sep),
              element_at(arr, k + 2))))
        .otherwise(array().cast("array<string>"))).as("pair"),
        col("freq"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
  }

  private def quote(s: String): String = java.util.regex.Pattern.quote(s)

  /** Learn `numMerges` merges over `docs(textCol)`. Stops early when no
    * pair reaches `minPairCount`. Ties break (count desc, pair asc in
    * UTF8 binary order), so the merge list is fully deterministic given
    * the corpus.
    *
    * Two execution modes, SAME output (BpeSpec pins them equal):
    *  - the corpus-size work is always the one counting pass inside
    *    [[wordTable]]; when the resulting distinct-word table fits
    *    `maxDriverWords`, the merge rounds run as plain driver
    *    arithmetic over (word, freq) — vocabulary-bounded state, the
    *    [[Pca.fit]]/fitCentroids precedent, and how production BPE
    *    trainers work (the word-count table of even a web-scale corpus
    *    is Zipf-bounded millions, not corpus-sized);
    *  - over the bound, the rounds stay distributed: per-round
    *    adjacent-pair explode → weighted top-1, merge applied as one
    *    `regexp_replace`, `localCheckpoint` per round to keep lineage
    *    flat. ~0.2 s/round of job overhead, which is why the driver
    *    path exists for every realistic vocabulary. */
  def fit(docs: DataFrame, textCol: String = "text", numMerges: Int = 50,
      minPairCount: Long = 2L, maxDriverWords: Long = 1L << 21): Seq[Merge] = {
    require(numMerges >= 1, "need at least one merge round")
    var words = wordTable(docs, textCol).truncateLineage()
    if (words.count() <= maxDriverWords) {
      val collected = words.collect().map(r => (r.getString(0), r.getLong(1)))
      words.unpersist()
      return fitDriver(collected, numMerges, minPairCount)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.length < numMerges) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      val next = top.headOption.filter(_.getLong(1) >= minPairCount)
      next match {
        case None => done = true
        case Some(row) =>
          val Array(l, r) = row.getString(0).split(Sep, 2)
          merges += Merge(merges.length + 1, l, r, row.getLong(1))
          val prev = words
          words = words
            .select(regexp_replace(col("syms"),
              quote(Sep + l + Sep + r) + "(?=" + quote(Sep) + ")",
              java.util.regex.Matcher.quoteReplacement(Sep + l + r))
              .as("syms"), col("freq"))
            .truncateLineage()
          prev.unpersist()
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Driver-side merge rounds over the collected (padded-syms, freq)
    * table — the exact distributed algorithm in plain Scala: per round,
    * freq-weighted adjacent-pair counts, top-1 by (count desc, pair asc
    * in UTF8 BINARY order — `orderBy` on StringType compares UTF-8
    * bytes, and Java String compareTo does not agree above the BMP, so
    * the comparator goes through [[UTF8String]]), then one greedy
    * left-to-right fuse pass per word. O(rounds × Σ|word|) —
    * milliseconds at any realistic vocabulary. */
  private def fitDriver(table: Array[(String, Long)], numMerges: Int,
      minPairCount: Long): Seq[Merge] = {
    import org.apache.spark.unsafe.types.UTF8String
    val syms = table.map { case (padded, _) =>
      padded.split(Sep).filter(_.nonEmpty)
    }
    val lens = syms.map(_.length)
    val freqs = table.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = new java.util.HashMap[String, Array[Long]]()
      var w = 0
      while (w < syms.length) {
        val s = syms(w); val n = lens(w); val f = freqs(w)
        var i = 0
        while (i < n - 1) {
          val key = s(i) + Sep + s(i + 1)
          val c = counts.get(key)
          if (c == null) counts.put(key, Array(f)) else c(0) += f
          i += 1
        }
        w += 1
      }
      var bestPair: String = null
      var bestKey: UTF8String = null
      var bestCnt = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c > bestCnt) {
          bestPair = e.getKey; bestKey = null; bestCnt = c
        } else if (c == bestCnt && bestPair != null) {
          if (bestKey == null) bestKey = UTF8String.fromString(bestPair)
          val k = UTF8String.fromString(e.getKey)
          if (k.compareTo(bestKey) < 0) { bestPair = e.getKey; bestKey = k }
        }
      }
      if (bestPair == null || bestCnt < minPairCount) done = true
      else {
        val Array(l, r) = bestPair.split(Sep, 2)
        val fused = l + r
        merges += Merge(merges.length + 1, l, r, bestCnt)
        var w2 = 0
        while (w2 < syms.length) {
          val s = syms(w2); val n = lens(w2)
          var read = 0; var write = 0
          while (read < n) {
            if (read + 1 < n && s(read) == l && s(read + 1) == r) {
              s(write) = fused; read += 2
            } else { s(write) = s(read); read += 1 }
            write += 1
          }
          lens(w2) = write
          w2 += 1
        }
      }
    }
    merges.toSeq
  }

  /** The learned merge list as a DataFrame — the persistable tokenizer
    * artifact (rank, left, right, merged, cnt), rank-ordered. */
  def mergeTable(docs: DataFrame, spark: org.apache.spark.sql.SparkSession,
      textCol: String = "text", numMerges: Int = 50,
      minPairCount: Long = 2L): DataFrame = {
    import spark.implicits._
    fit(docs, textCol, numMerges, minPairCount)
      .map(m => (m.rank.toLong, m.left, m.right, m.left + m.right, m.count))
      .toDF("rank", "left", "right", "merged", "cnt")
  }

  /** Apply learned merges to new text: adds `bpe_syms`
    * (array&lt;array&lt;string&gt;&gt;, one symbol array per
    * pre-token). Map-only — the native
    * [[graft.functions.BpeApply]] expression applies each merge as one
    * in-place array pass with a Zipf-exploiting word memo, replacing
    * the earlier stack of `numMerges` interpreted `regexp_replace`s
    * (the engine's slowest query before the switch; semantics pinned
    * identical by BpeApplySpec against [[tokenizeWithRegex]]). */
  def tokenizeWith(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame =
    docs.withColumn("bpe_syms",
      graft.functions.BpeApply.bpeApply(
        TextFunctions.tokens(col(textCol)),
        merges.map(m => (m.left, m.right))))

  /** The regex-tower reference implementation of [[tokenizeWith]] —
    * kept as the executable specification the native expression is
    * tested against (one codegen'd `regexp_replace` per merge over the
    * U+0001-padded symbol string; see the class doc for why the
    * lookahead gives textbook greedy left-to-right merge semantics). */
  private[graft] def tokenizeWithRegex(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame = {
    def applied(w: Column): Column = merges.foldLeft(padSyms(w)) {
      case (acc, m) =>
        regexp_replace(acc,
          quote(Sep + m.left + Sep + m.right) + "(?=" + quote(Sep) + ")",
          java.util.regex.Matcher.quoteReplacement(Sep + m.left + m.right))
    }
    docs.withColumn("bpe_syms",
      transform(
        filter(TextFunctions.tokens(col(textCol)), w => w =!= ""),
        w => filter(split(applied(w), Sep), c => c =!= "")))
  }

  /** Tokenizer fertility per stratum — subword tokens per word, THE
    * cross-lingual tokenizer-equity metric (Rust et al., "How Good is
    * Your Tokenizer?", ACL 2021: languages a tokenizer serves badly
    * pay more tokens for the same words, which at a fixed sequence
    * budget means less context). Reported with chars-per-token, the
    * compression view of the same question. A mixture plan
    * ([[Curation.tokenBudgetPlan]]) quoting token counts without a
    * fertility check silently budgets hard-tokenized strata less text.
    *
    * Scale shape: [[tokenizeWith]] is map-only; the report is one
    * grouped agg over per-row symbol counts (map-side partials),
    * stratum-cardinality output. */
  def fertilityReport(docs: DataFrame, merges: Seq[Merge],
      strataCol: String = "lang", textCol: String = "text"): DataFrame =
    tokenizeWith(docs, merges, textCol)
      // the </w> marker is framing, not vocabulary: a STANDALONE
      // marker symbol doesn't count as a token, and a fused one
      // ("ab</w>") counts its real chars only — otherwise every word
      // pays a phantom token and fertility can never reach 1.0
      .select(col(strataCol),
        size(col("bpe_syms")).cast("long").as("__nw"),
        expr("aggregate(transform(bpe_syms," +
          " w -> size(filter(w, s -> s != '</w>'))), 0L," +
          " (a, x) -> a + x)").as("__nt"),
        expr("aggregate(transform(flatten(bpe_syms)," +
          " s -> length(replace(s, '</w>', ''))), 0L," +
          " (a, x) -> a + x)").as("__nc"))
      .filter(col("__nw") > 0)
      .groupBy(col(strataCol))
      .agg(
        sum("__nw").as("n_words"),
        sum("__nt").as("n_bpe_tokens"),
        sum("__nc").as("n_chars"),
        round(sum("__nt").cast("double") / sum("__nw"), 4).as("fertility"),
        round(sum("__nc").cast("double") / sum("__nt"), 4)
          .as("chars_per_token"))
      .orderBy(col(strataCol))

  /** Shared DuckDB replay of the TRAINING loop (used by both
    * oracles): a recursive CTE carries the exploded (word, pos, sym)
    * symbol table round by round — plus the (ml, mr, mc) merge that
    * produced each round — re-deriving the best pair with the
    * engine's exact tie-break (count desc, `l␁r` binary asc) and
    * applying it with textbook greedy left-to-right semantics. The
    * greedy fuse is window-expressible: positions where (sym, next) =
    * (L, R) form runs, and exactly the odd-numbered members of each
    * run fuse (a run longer than one arises only when L = R, where
    * greedy takes every other occurrence). Stop conditions (round
    * budget, min pair count) mirror [[fit]]. DuckDB trap: the
    * anchor's merge columns must be CAST(NULL AS ...) — untyped
    * nulls, like bare numeric literals, would pin the recursion's
    * carried types wrong. */
  private def bpeReplayCte(numMerges: Int, minPairCount: Long): String =
    s"""WITH RECURSIVE
       |toks AS (
       |  SELECT lang, unnest(list_filter(str_split_regex(trim(text),
       |    '\\s+'), w -> w <> '')) AS word
       |  FROM documents),
       |words AS (
       |  SELECT word, COUNT(*) AS freq FROM toks GROUP BY word),
       |wsyms AS (
       |  SELECT word, freq,
       |    list_append(list_filter(string_split(word, ''),
       |      c -> c <> '' AND c <> chr(1)), '</w>') AS syms
       |  FROM words),
       |init AS (
       |  SELECT word, freq, i AS pos, syms[i] AS sym
       |  FROM wsyms, UNNEST(range(1, len(syms) + 1)) t(i)),
       |r AS (
       |  SELECT 0 AS round, word, freq, pos, sym,
       |    CAST(NULL AS VARCHAR) AS ml, CAST(NULL AS VARCHAR) AS mr,
       |    CAST(NULL AS BIGINT) AS mc
       |  FROM init
       |  UNION ALL
       |  SELECT round + 1, word, freq, pos, sym, ml, mr, mc FROM (
       |    WITH cur AS (SELECT * FROM r),
       |    best AS (
       |      SELECT a.sym AS l, b.sym AS rr,
       |        CAST(SUM(a.freq) AS BIGINT) AS cnt
       |      FROM cur a JOIN cur b
       |        ON b.word = a.word AND b.round = a.round
       |        AND b.pos = a.pos + 1
       |      GROUP BY a.sym, b.sym
       |      HAVING SUM(a.freq) >= $minPairCount
       |      ORDER BY SUM(a.freq) DESC, (a.sym || chr(1) || b.sym) ASC
       |      LIMIT 1),
       |    marked AS (
       |      SELECT c.round, c.word, c.freq, c.pos, c.sym,
       |        (c.sym = best.l AND LEAD(c.sym) OVER w = best.rr) AS m,
       |        best.l AS bl, best.rr AS brr, best.cnt AS bcnt
       |      FROM cur c, best
       |      WINDOW w AS (PARTITION BY c.word ORDER BY c.pos)),
       |    starts AS (
       |      SELECT *, m AND (ROW_NUMBER() OVER
       |          (PARTITION BY word, grp ORDER BY pos) % 2 = 1) AS fuse
       |      FROM (
       |        SELECT *, CASE WHEN m THEN pos - ROW_NUMBER() OVER
       |            (PARTITION BY word, m ORDER BY pos) END AS grp
       |        FROM marked) runs),
       |    fused AS (
       |      SELECT round, word, freq, pos,
       |        CASE WHEN fuse THEN sym || nxt_sym ELSE sym END AS sym2,
       |        LAG(fuse, 1, false) OVER (PARTITION BY word ORDER BY pos)
       |          AS consumed,
       |        bl, brr, bcnt
       |      FROM (
       |        SELECT s.*, LEAD(s.sym) OVER
       |            (PARTITION BY s.word ORDER BY s.pos) AS nxt_sym
       |        FROM starts s) t0)
       |    SELECT f.round, f.word, f.freq,
       |      ROW_NUMBER() OVER (PARTITION BY f.word ORDER BY f.pos) AS pos,
       |      f.sym2 AS sym, f.bl AS ml, f.brr AS mr, f.bcnt AS mc
       |    FROM fused f
       |    WHERE NOT f.consumed) nxt
       |  WHERE round < $numMerges)""".stripMargin

  /** DuckDB oracle for [[fit]]'s merge table over `documents` — the
    * per-round chosen pair straight out of [[bpeReplayCte]]. */
  def mergesOracleSql(numMerges: Int = 30,
      minPairCount: Long = 2L): String =
    s"""${bpeReplayCte(numMerges, minPairCount)},
       |m AS (SELECT DISTINCT round, ml, mr, mc FROM r WHERE round >= 1)
       |SELECT round AS rank, ml AS "left", mr AS "right",
       |  ml || mr AS merged, mc AS cnt
       |FROM m ORDER BY rank""".stripMargin

  /** DuckDB oracle for [[fertilityReport]] over `documents` — the
    * per-lang fertility of [[bpeReplayCte]]'s final symbol table. */
  def fertilityOracleSql(numMerges: Int = 30,
      minPairCount: Long = 2L): String =
    s"""${bpeReplayCte(numMerges, minPairCount)},
       |fin AS (
       |  SELECT word, pos, sym FROM r
       |  WHERE round = (SELECT MAX(round) FROM r)),
       |wstats AS (
       |  SELECT word,
       |    COUNT(*) FILTER (WHERE sym <> '</w>') AS nt,
       |    SUM(length(replace(sym, '</w>', ''))) AS nc
       |  FROM fin GROUP BY word),
       |perlang AS (
       |  SELECT t.lang, COUNT(*) AS n_words,
       |    SUM(w.nt) AS n_bpe_tokens, SUM(w.nc) AS n_chars
       |  FROM toks t JOIN wstats w ON w.word = t.word
       |  GROUP BY t.lang)
       |SELECT lang, n_words, n_bpe_tokens, n_chars,
       |  ROUND(CAST(n_bpe_tokens AS DOUBLE) / n_words, 4) AS fertility,
       |  ROUND(CAST(n_chars AS DOUBLE) / n_bpe_tokens, 4)
       |    AS chars_per_token
       |FROM perlang ORDER BY lang""".stripMargin
}
