package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination: flag training documents that share any
  * token n-gram with a held-out evaluation set, so eval questions don't
  * leak into the training mix (the standard n-gram-overlap protocol —
  * e.g. Brown et al., "Language Models are Few-Shot Learners", 2020,
  * §C use 13-gram matching; the n is a parameter here).
  *
  * Scale shape: the corpus side is explode-to-distinct-grams (map-side
  * combine collapses within-doc repeats before any exchange); the
  * benchmark side — tiny by construction, eval suites are MBs against a
  * 100 TB corpus — is collapsed to its distinct gram set and BROADCAST,
  * so the overlap test is a broadcast semi-ish join with no shuffle of
  * the corpus grams at all. The only wide operation is the final
  * per-doc count aggregate, keyed on doc_id.
  */
object Decontaminate {

  /** (id, gram) pairs: every `n`-token window of `textCol`, joined
    * back to a space-separated string. NOT deduplicated — within-doc
    * repeats survive so callers choose where dedup happens (the corpus
    * side must NOT pay a corpus-wide distinct shuffle; see [[overlap]]). */
  private[operators] def docGrams(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      // drop sub-n docs BEFORE sequence(): start > stop would generate
      // a descending index range, not an empty one
      .filter(size(col("__toks")) >= n)
      .select(col(idCol),
        explode(expr(
          s"transform(sequence(1, size(__toks) - ${n - 1}), " +
            s"i -> array_join(slice(__toks, i, $n), ' '))")).as("gram"))

  /** Distinct benchmark gram set, computed once and reused across
    * micro-batches by the streaming gate
    * ([[graft.streaming.StreamingDecontaminate]]): tiny by
    * construction (benchmark suites are fixed-size), so it broadcasts. */
  def benchGrams(benchmark: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docGrams(benchmark, n, idCol, textCol)
      .select(col("gram")).distinct()

  /** Per-document admission decision against a precomputed benchmark
    * gram set: `(idCol, n_shared_grams, admitted)` for EVERY input
    * document — zero-overlap (and sub-n-token) docs report 0 shared
    * and admit. Stateless in the corpus: one broadcast gram join per
    * batch, nothing carried between batches. */
  def gateDecisions(docs: DataFrame, benchGramSet: DataFrame,
      n: Int = 5, rejectMin: Long = 1L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hits = docGrams(docs, n, idCol, textCol)
      .join(broadcast(benchGramSet), "gram")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("__n"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("__n"), lit(0L)) < rejectMin).as("admitted"))
  }

  /** Contaminated corpus docs: for each corpus document sharing at
    * least one `n`-gram with any benchmark document, report how many
    * distinct grams overlap and how many benchmark docs are hit.
    * Requires every corpus/benchmark doc to have >= n tokens to
    * contribute grams (shorter docs can't match and are clean). */
  def overlap(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    // Corpus grams stay UN-deduplicated: a corpus-wide distinct would
    // shuffle every gram of every document, whereas the broadcast join
    // filters down to benchmark matches first (tiny by construction) —
    // countDistinct in the final agg absorbs within-doc repeats there.
    val corpusGrams = docGrams(corpus, n, idCol, textCol)
    val benchGrams = docGrams(benchmark, n, idCol, textCol)
      .withColumnRenamed(idCol, "bench_id")
      .distinct()
    corpusGrams
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .orderBy(col(idCol))
  }

  /** Surgical decontamination — span EXCISION instead of document
    * drop: where [[overlap]] flags a whole document for sharing
    * benchmark n-grams, this removes exactly the contaminated token
    * spans (every token covered by a matching n-gram) and keeps the
    * rest — the right call for long documents that quote a benchmark
    * once (dropping them wastes 99% clean tokens; keeping them leaks
    * the quote). The span-joining convention follows the q91/q92
    * repeated-span excision surface.
    *
    * Output (contaminated docs only, the [[overlap]] convention):
    * `(doc_id, n_tokens, n_matches, tokens_removed, clean_text)`
    * ordered by doc_id, with `clean_text` the surviving tokens joined
    * by single spaces.
    *
    * Scale shape: positions explode to corpus-token rows but the
    * BROADCAST benchmark join filters them immediately (q72's
    * discipline); the rebuild joins match-lists (contaminated-doc
    * cardinality) back on the id key, and the per-doc mask is
    * O(n_tokens·matches) map work. */
  def exciseContaminated(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 4, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    val benchGrams = docGrams(benchmark, n, idCol, textCol)
      .select(col("gram")).distinct()
    val toks = corpus
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= n)
    val posGrams = toks.select(col(idCol),
      explode(expr(
        s"transform(sequence(1, size(__toks) - ${n - 1}), " +
          s"i -> struct(i AS i, array_join(slice(__toks, i, $n), ' ') " +
          "AS gram))")).as("pg"))
      .select(col(idCol), col("pg.i").as("__i"), col("pg.gram").as("gram"))
    val starts = posGrams.join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__i"))).as("__starts"),
        count(lit(1)).as("n_matches"))
    starts.join(toks, Seq(idCol))
      .withColumn("__clean", expr(
        s"filter(__toks, (x, j) -> NOT exists(__starts, " +
          s"s -> j + 1 >= s AND j + 1 < s + $n))"))
      .select(col(idCol),
        size(col("__toks")).cast("bigint").as("n_tokens"),
        col("n_matches"),
        (size(col("__toks")) - size(col("__clean"))).cast("bigint")
          .as("tokens_removed"),
        array_join(col("__clean"), " ").as("clean_text"))
      .orderBy(idCol)
  }

  /** DuckDB oracle for [[exciseContaminated]] with the q72 fixture
    * split (corpus = doc_id % 41 ≠ 0, benchmark = % 41 = 0). */
  def exciseOracleSql(n: Int = 4): String =
    s"""WITH tok AS (
       |  SELECT doc_id, str_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents WHERE doc_id % 41 <> 0),
       |tok_ok AS (SELECT * FROM tok WHERE len(toks) >= $n),
       |bench AS (
       |  SELECT DISTINCT UNNEST(list_transform(
       |      range(1, len(toks) - ${n - 2}),
       |      i -> concat_ws(' ', list_slice(toks, i, i + ${n - 1}))))
       |    AS gram
       |  FROM (SELECT str_split_regex(trim(text), '\\s+') AS toks
       |    FROM documents WHERE doc_id % 41 = 0)
       |  WHERE len(toks) >= $n),
       |pos AS (
       |  SELECT doc_id, UNNEST(list_transform(
       |      range(1, len(toks) - ${n - 2}),
       |      i -> struct_pack(i := i,
       |        gram := concat_ws(' ', list_slice(toks, i, i + ${n - 1})))))
       |    AS pg
       |  FROM tok_ok),
       |m AS (
       |  SELECT doc_id, pg.i AS i
       |  FROM pos JOIN bench ON pg.gram = bench.gram),
       |starts AS (
       |  SELECT doc_id, list(DISTINCT i) AS ss,
       |    COUNT(*) AS n_matches
       |  FROM m GROUP BY 1),
       |rebuilt AS (
       |  SELECT s.doc_id, len(t.toks) AS n_tokens, s.n_matches,
       |    list_filter(list_transform(t.toks, (x, j) -> CASE WHEN
       |        len(list_filter(s.ss,
       |          v -> j >= v AND j < v + $n)) = 0
       |      THEN x END), x -> x IS NOT NULL) AS clean
       |  FROM starts s JOIN tok_ok t ON s.doc_id = t.doc_id)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_matches AS BIGINT) AS n_matches,
       |  CAST(n_tokens - len(clean) AS BIGINT) AS tokens_removed,
       |  COALESCE(array_to_string(clean, ' '), '') AS clean_text
       |FROM rebuilt ORDER BY doc_id""".stripMargin

  /** Semantic (embedding-space) decontamination: flag corpus rows whose
    * embedding is too close to ANY held-out benchmark embedding — the
    * vector analog of the n-gram gate above, catching paraphrased or
    * re-tokenized eval leakage that exact n-gram matching misses
    * (embedding-similarity decontamination as popularized in public
    * LLM-corpus reports, e.g. the fuzzy dedup/decon discussion of Lee
    * et al. 2021, arXiv:2107.06499, and SemDeDup's cosine protocol,
    * Abbas et al. 2023, arXiv:2303.09540).
    *
    * Scale shape: the benchmark side is collected ONCE (bounded —
    * `maxBench` guards the contract; eval suites are MBs against a
    * 100 TB corpus) and rides into [[graft.functions.MaxCosine]] as a
    * plan reference object, so the corpus pass is MAP-ONLY: no join, no
    * pair rows, no aggregation exchange — each row computes its own max
    * cosine inside whole-stage codegen. Contrast with a broadcast join
    * + groupBy(max), which would materialize |corpus|·|bench| rows into
    * a hash aggregate.
    *
    * Returns every corpus row: `(idCol, max_bench_cos, contaminated)`,
    * with the flag computed from the ROUNDED similarity so the
    * admit/reject boundary is reproducible across engines (the oracle
    * rounds identically). A zero-norm corpus embedding has undefined
    * cosine (NaN); both Spark and DuckDB order NaN above every number,
    * so such rows FLAG rather than silently admit — fail-closed. */
  def semanticGate(corpus: DataFrame, benchmark: DataFrame,
      tau: Double, idCol: String = "vec_id", vecCol: String = "embedding",
      maxBench: Int = 1 << 16): DataFrame = {
    val rows = benchmark.select(col(vecCol)).limit(maxBench + 1).collect()
    require(rows.length <= maxBench,
      s"benchmark exceeds maxBench=$maxBench vectors — a benchmark this " +
        "large should go through the IVF path, not a broadcast gate")
    require(rows.nonEmpty, "empty benchmark set")
    val refs = rows.map(_.getSeq[Float](0).toArray)
    val cos = round(
      graft.functions.MaxCosine.maxCosine(col(vecCol), refs), 6)
    corpus.select(col(idCol), cos.as("max_bench_cos"))
      .withColumn("contaminated", col("max_bench_cos") >= tau)
      .orderBy(col(idCol))
  }

  /** Cross-source leakage matrix: for every pair of corpus sources,
    * how many distinct token `k`-shingles they share, normalized by
    * the smaller source's shingle vocabulary (a containment-style
    * overlap in [0,1]) — the dataset-level view of contamination:
    * "how much of source A's content also lives in source B" guides
    * both dedup ordering and mixture double-count corrections.
    *
    * Scale shape: the corpus collapses to DISTINCT (source, shingle)
    * pairs first — bounded by sources × shingle vocabulary, far below
    * corpus size — and the pair join keys on the shingle, so a
    * shingle shared by s sources costs s² pair rows, never doc².
    * Shingles travel as hashed longs (native ShingleHashes). */
  def crossSourceOverlap(docs: DataFrame, k: Int = 3,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    val sh = docs
      .select(col(sourceCol).as("__src"),
        explode(graft.functions.ShingleHashes.shingleHashes(
          TextFunctions.tokens(col(textCol)), k)).as("sh"))
      .distinct()
    val totals = sh.groupBy("__src").agg(count(lit(1)).as("__n"))
    val pairs = sh.select(col("__src").as("src_a"), col("sh"))
      .join(sh.select(col("__src").as("src_b"), col("sh")), "sh")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_shingles"))
    pairs
      .join(broadcast(totals.select(col("__src").as("src_a"), col("__n").as("__na"))), "src_a")
      .join(broadcast(totals.select(col("__src").as("src_b"), col("__n").as("__nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_shingles"),
        round(col("shared_shingles").cast("double") /
          least(col("__na"), col("__nb")).cast("double"), 6).as("overlap"))
      .orderBy("src_a", "src_b")
  }
}
