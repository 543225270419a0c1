package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** End-to-end corpus curation: the composed pass a training-data run
  * actually executes — scrub, quality-filter, dedup, split — built
  * entirely from this engine's individually-verified operators, so the
  * whole chain stays one declarative Catalyst plan (filters and
  * projections fuse; nothing materializes between stages).
  *
  * Scale shape: stages 1-2 are map-only — the regex rewrite and the
  * token stats both evaluate per-row (`array_distinct` gives the
  * distinct-token ratio without [[TextQuality]]'s bigram explode, which
  * the filter doesn't need — one scan, no join-back). Stage 3's
  * dedup-key window is the pipeline's ONLY wide op before the final
  * sort; stage 4 is map-only hash assignment.
  */
object Curation {

  /** Scrub with `rules`, drop documents whose distinct-token ratio
    * falls below `minDistinctRatio` (repetition junk), keep the lowest
    * id per `dedupPrefix`-char redacted-text prefix (near-boilerplate
    * collapse), then assign reproducible splits by md5(id) prefix.
    * Output: (idCol, split, n_tokens, distinct_ratio), plus the
    * `redacted` text when `withText` is set (the corpus-publishing
    * shape — [[graft.pipeline.CurationJob]] uses it). */
  def pipeline(docs: DataFrame,
      rules: Seq[Scrub.Rule],
      minDistinctRatio: Double = 0.35,
      dedupPrefix: Int = 40,
      splits: Seq[(String, Double)] =
        Seq(("train", 0.90), ("val", 0.07), ("test", 0.03)),
      idCol: String = "doc_id",
      withText: Boolean = false): DataFrame = {
    val redacted = Scrub.redact(docs, rules)
      .select(col(idCol), col("redacted"))
    val kept = redacted
      .withColumn("__toks",
        graft.functions.TextFunctions.tokens(col("redacted")))
      .withColumn("n_tokens", size(col("__toks")).cast("bigint"))
      .filter(col("n_tokens") >= 2)
      .withColumn("distinct_ratio",
        round(size(array_distinct(col("__toks"))).cast("double") /
          col("n_tokens"), 4))
      .drop("__toks")
      .filter(col("distinct_ratio") >= minDistinctRatio)
    val w = Window
      .partitionBy(substring(col("redacted"), 1, dedupPrefix))
      .orderBy(col(idCol))
    val deduped = kept
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
    val outCols =
      Seq(col(idCol), col("split"), col("n_tokens"), col("distinct_ratio")) ++
        (if (withText) Seq(col("redacted")) else Nil)
    // no trailing sort: publishing (TableLog merge/overwrite) re-shuffles
    // anyway — callers needing a stable order (the q77 oracle) add it
    Sampling.hashSplit(deduped, splits, idCol)
      .select(outCols: _*)
  }

  /** Deterministic training-shard assignment: shard = first 8 md5 hex
    * digits of the id, mod `nShards` — the fixed-shard export layout a
    * training job streams (the webdataset/tfrecord pattern). Map-only
    * BY DESIGN: a row_number-based sharder would serialize the whole
    * corpus through one global-sort task at 100 TB; hash-bucketing
    * shards in place, sizes uniform in expectation, and a document's
    * shard never changes as the corpus grows (same stability argument
    * as [[Sampling.hashSplit]]). `shard_key` (the full md5) defines
    * the reproducible within-shard read order, so a re-export of the
    * same corpus is byte-identical — that, not randomness, is what
    * "shuffled shards" means operationally: the hash order is already
    * decorrelated from ingest order. */
  def shardAssign(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "need at least one shard")
    val h = md5(col(idCol).cast("string"))
    docs
      .withColumn("shard",
        conv(substring(h, 1, 8), 16, 10).cast("bigint") % nShards)
      .withColumn("shard_key", h)
  }

  /** Per-shard manifest the training job consumes before reading any
    * data: doc/char counts plus the first/last read-order keys (an
    * attestation that a re-export produced the identical shard). One
    * grouped agg over the map-only assignment — the manifest costs a
    * single shuffle of `nShards` partial rows per task. */
  def shardManifest(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id", charsCol: String = "n_chars"): DataFrame =
    shardAssign(docs, nShards, idCol)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(charsCol)).as("total_chars"),
        min("shard_key").as("first_key"),
        max("shard_key").as("last_key"))
      .orderBy("shard")

  /** Physical export: one directory per shard, rows within each file
    * in `shard_key` order. The repartition keys on `shard` so each
    * shard's rows land in one task (one file per shard directory, the
    * layout shard-streaming readers expect); `partitionBy` makes the
    * directory name the shard id. Layout and determinism are spec-verified
    * ([[graft.CurationSpec]]); the manifest pairs with the export as
    * its oracle-checkable summary. */
  def writeShards(docs: DataFrame, path: String, nShards: Int,
      idCol: String = "doc_id"): Unit =
    shardAssign(docs, nShards, idCol)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "shard_key")
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Token-budget plan: given a total training-token budget and a
    * target mixture over a stratum column, report per stratum how many
    * tokens exist, how many the mixture demands, and the implied epoch
    * count — the pre-run feasibility check behind published mixture
    * recipes (epoching a source past ~4 repeats measurably degrades,
    * per Muennighoff et al., "Scaling Data-Constrained Language
    * Models", NeurIPS 2023 — the `maxEpochs` default). A stratum with
    * `epochs` over the cap can't fill its seat allocation without
    * over-repeating: the run must either shrink the budget, reweight,
    * or source more data — this report is what says so BEFORE any
    * shuffle-heavy assembly starts.
    *
    * Scale shape: ONE grouped aggregate over per-row codegen'd token
    * counts (map-side partial agg; whitespace tokenization matches the
    * engine-wide [[graft.functions.TextFunctions.tokens]] contract);
    * weights ride as a literal. Output is stratum-cardinality rows.
    *
    * Strata absent from `weights` get weight 0 (reported, flagged
    * unused); weights are normalized so callers can pass ratios. */
  def tokenBudgetPlan(docs: DataFrame, totalBudget: Long,
      weights: Map[String, Double], strataCol: String = "lang",
      textCol: String = "text", maxEpochs: Double = 4.0): DataFrame = {
    require(totalBudget > 0, "token budget must be positive")
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0),
      "weights must be non-negative and non-empty")
    val wSum = weights.values.sum
    require(wSum > 0.0, "weights must not all be zero")
    val wNorm = weights.map { case (k, v) => k -> v / wSum }
    val wCol = wNorm.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc) }
    val nTokens = size(filter(
      graft.functions.TextFunctions.tokens(col(textCol)), t => t =!= ""))
    docs
      .groupBy(col(strataCol))
      .agg(sum(nTokens.cast("long")).as("avail_tokens"))
      .withColumn("weight", round(wCol, 6))
      .withColumn("target_tokens",
        round(lit(totalBudget.toDouble) * col("weight")).cast("long"))
      .withColumn("epochs",
        round(col("target_tokens").cast("double") /
          col("avail_tokens").cast("double"), 4))
      .withColumn("oversubscribed", col("epochs") > maxEpochs)
      .orderBy(col(strataCol))
  }

  /** One-row dataset card: the stats block every corpus release ships
    * (datasheet / dataset-card convention, Gebru et al., CACM 2021) —
    * size, stratum mix (count, Shannon entropy in bits, dominant
    * stratum and its share), length distribution (mean / exact p50 /
    * p95), and the exact-duplicate text ratio. The single place a
    * consumer looks before the per-operator reports.
    *
    * Scale shape: one full-corpus aggregate (map-side partials; the
    * exact percentiles are Spark's `percentile`, a single-agg sketch
    * of the value multiset — at 100 TB swap for `percentile_approx`
    * and re-pin the oracle rounding), one stratum-cardinality agg for
    * the mix, then 1-row × 1-row assembly joins (broadcast stat
    * factors, the registered-intentional NLJ shape). Dup detection
    * counts distinct md5 digests — 16-byte keys travel, never text;
    * md5 (not xxhash64) keeps the count engine-portable for the
    * oracle. */
  def corpusCard(docs: DataFrame, strataCol: String = "lang",
      textCol: String = "text", lenCol: String = "n_chars"): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col(lenCol)).as("total_chars"),
      countDistinct(col(strataCol)).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      round(avg(col(lenCol)), 2).as("avg_chars"),
      round(expr(s"percentile($lenCol, 0.5)"), 2).as("p50_chars"),
      round(expr(s"percentile($lenCol, 0.95)"), 2).as("p95_chars"),
      countDistinct(md5(col(textCol))).as("n_distinct_texts"))
    val strata = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("c"))
    // entropy over the stratum distribution: the total rides a
    // stratum-cardinality window (tiny frame), not a second scan
    val withP = strata.withColumn("p",
      col("c").cast("double") / sum("c").over(Window.partitionBy()))
    val ent = withP.agg(
      round(sum(-col("p") * log2(col("p"))), 4).as("lang_entropy_bits"))
    val top = strata.orderBy(col("c").desc, col(strataCol))
      .limit(1)
      .select(col(strataCol).as("top_lang"),
        col("c").as("__top_c"))
    base.crossJoin(ent).crossJoin(top)
      .withColumn("top_lang_share",
        round(col("__top_c").cast("double") / col("n_docs"), 4))
      .withColumn("distinct_ratio",
        round(col("n_distinct_texts").cast("double") / col("n_docs"), 4))
      .drop("__top_c")
  }

  /** UniMax budget allocation (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023): spread a token budget as UNIFORMLY as
    * possible across strata subject to a per-stratum epoch cap —
    * the closed-form answer to the feasibility problem
    * [[tokenBudgetPlan]] only reports on. The paper's sequential
    * greedy (allocate the smallest language first, redistribute its
    * unused share) is exactly water-filling, so the whole allocation
    * is the standard closed form: sort capacities ascending; stratum
    * i is CAPPED iff capᵢ·(L−i+1) ≤ B − Σ_{j<i} capⱼ (its cap fits
    * under an equal split of what remains); everyone else gets the
    * water level θ = (B − Σ_capped cap)/(L − n_capped).
    *
    * Output per stratum: `(stratum, avail_tokens, cap_tokens,
    * alloc_tokens, epochs, capped)` — Σ alloc = min(B, Σ cap).
    *
    * Scale shape: one grouped token-count agg over the corpus
    * (map-side partials), then stratum-cardinality windows and a
    * 1-row stat factor. Budget rides as a fraction of the corpus so
    * the fixture exercises both regimes at any SF. */
  def unimaxAllocation(docs: DataFrame, budgetTokensPerCorpus: Double,
      maxEpochs: Double = 4.0, strataCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    require(budgetTokensPerCorpus > 0.0 && maxEpochs > 0.0,
      "budget and epoch cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val nTokens = size(filter(
      graft.functions.TextFunctions.tokens(col(textCol)), t => t =!= ""))
    val caps = docs
      .groupBy(col(strataCol).as("stratum"))
      .agg(sum(nTokens.cast("long")).as("avail_tokens"))
      .withColumn("cap",
        col("avail_tokens").cast("double") * maxEpochs)
    val wAsc = Window.orderBy(col("cap").asc, col("stratum").asc)
    val pre = caps
      .withColumn("__i", row_number().over(wAsc))
      .withColumn("__prefix",
        sum("cap").over(wAsc.rowsBetween(Window.unboundedPreceding, 0)))
    val tot = pre.agg(count(lit(1)).as("__L"),
      (sum("avail_tokens") * budgetTokensPerCorpus).as("__B"))
    val j = pre.crossJoin(broadcast(tot))   // 1-row stat factor
      .withColumn("__capped",
        col("cap") * (col("__L") - col("__i") + 1.0) <=
          col("__B") - (col("__prefix") - col("cap")))
    val level = j.agg(
      sum(when(col("__capped"), 1L).otherwise(0L)).as("__nc"),
      sum(when(col("__capped"), col("cap")).otherwise(lit(0.0)))
        .as("__sc"),
      first("__L").as("__L2"), first("__B").as("__B2"))
      .withColumn("__theta",
        when(col("__L2") > col("__nc"),
          (col("__B2") - col("__sc")) /
            (col("__L2") - col("__nc")).cast("double"))
          .otherwise(lit(0.0)))
    j.crossJoin(broadcast(level.select("__theta")))  // 1-row stat factor
      .select(
        col("stratum"),
        col("avail_tokens"),
        col("cap").cast("long").as("cap_tokens"),
        round(when(col("__capped"), col("cap"))
          .otherwise(col("__theta")), 2).as("alloc_tokens"),
        round(when(col("__capped"), col("cap"))
          .otherwise(col("__theta")) /
          col("avail_tokens").cast("double"), 6).as("epochs"),
        col("__capped").as("capped"))
      .orderBy("stratum")
  }

  /** DuckDB oracle for [[unimaxAllocation]] on documents. */
  def unimaxOracleSql(budgetTokensPerCorpus: Double,
      maxEpochs: Double = 4.0): String =
    s"""WITH caps AS (
       |  SELECT lang AS stratum,
       |    SUM(len(list_filter(str_split_regex(trim(text), '\\s+'),
       |      x -> x <> ''))) AS avail_tokens
       |  FROM documents GROUP BY 1),
       |c2 AS (
       |  SELECT stratum, avail_tokens,
       |    CAST(avail_tokens AS DOUBLE) * CAST($maxEpochs AS DOUBLE)
       |      AS cap
       |  FROM caps),
       |pre AS (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY cap, stratum) AS i,
       |    SUM(cap) OVER (ORDER BY cap, stratum
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
       |  FROM c2),
       |tot AS (
       |  SELECT COUNT(*) AS l,
       |    SUM(avail_tokens) * CAST($budgetTokensPerCorpus AS DOUBLE)
       |      AS b
       |  FROM pre),
       |j AS (
       |  SELECT pre.*, tot.l, tot.b,
       |    cap * (tot.l - i + 1.0) <= tot.b - (prefix - cap) AS capped
       |  FROM pre, tot),
       |lvl AS (
       |  SELECT SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS nc,
       |    SUM(CASE WHEN capped THEN cap ELSE 0.0 END) AS sc,
       |    ANY_VALUE(l) AS l2, ANY_VALUE(b) AS b2
       |  FROM j),
       |theta AS (
       |  SELECT CASE WHEN l2 > nc
       |    THEN (b2 - sc) / CAST(l2 - nc AS DOUBLE) ELSE 0.0 END AS th
       |  FROM lvl)
       |SELECT stratum, CAST(avail_tokens AS BIGINT) AS avail_tokens,
       |  CAST(cap AS BIGINT) AS cap_tokens,
       |  ROUND(CASE WHEN capped THEN cap ELSE th END, 2) AS alloc_tokens,
       |  ROUND((CASE WHEN capped THEN cap ELSE th END) /
       |    CAST(avail_tokens AS DOUBLE), 6) AS epochs,
       |  capped
       |FROM j, theta ORDER BY stratum""".stripMargin

  /** Data-constrained effective tokens (Muennighoff et al., NeurIPS
    * 2023 "Scaling data-constrained language models"): repeating a
    * corpus buys diminishing returns — the fitted decay gives
    * effective tokens D′ = U·(1 + R*·(1−e^{−R/R*})) for R epochs of
    * repetition beyond the first over U unique tokens, with
    * R* ≈ 15.39 the paper's fitted half-life. Consumes an allocation
    * table (the [[unimaxAllocation]] output): per stratum, how many
    * of the allocated tokens are WORTH anything, and the efficiency
    * ratio a mixture planner trades against fresh-data acquisition.
    *
    * Scale shape: map-only arithmetic on a stratum-cardinality frame.
    * Output: `(stratum, avail_tokens, alloc_tokens, epochs,
    * effective_tokens, efficiency)` ordered by stratum. */
  def effectiveData(alloc: DataFrame,
      rStar: Double = 15.39): DataFrame = {
    val u = col("avail_tokens").cast("double")
    val a = col("alloc_tokens").cast("double")
    val ep = a / u
    val r = ep - 1.0
    val eff = when(ep <= 1.0, a).otherwise(
      u * (lit(1.0) + (exp((r * -1.0) / rStar) * -1.0 + 1.0) * rStar))
    alloc.select(col("stratum"), col("avail_tokens"),
        col("alloc_tokens"),
        round(ep, 6).as("epochs"),
        round(eff, 2).as("effective_tokens"),
        round(when(a > 0.0, eff / a), 6).as("efficiency"))
      .orderBy("stratum")
  }

  /** DuckDB oracle for [[effectiveData]] over the q293 UniMax
    * allocation. */
  def effectiveDataOracleSql(budgetTokensPerCorpus: Double,
      maxEpochs: Double = 4.0, rStar: Double = 15.39): String =
    s"""WITH alloc AS (${unimaxOracleSql(budgetTokensPerCorpus, maxEpochs)}),
       |e AS (
       |  SELECT stratum, avail_tokens, alloc_tokens,
       |    CAST(alloc_tokens AS DOUBLE) /
       |      CAST(avail_tokens AS DOUBLE) AS ep
       |  FROM alloc)
       |SELECT stratum, avail_tokens, alloc_tokens,
       |  ROUND(ep, 6) AS epochs,
       |  ROUND(CASE WHEN ep <= 1.0 THEN CAST(alloc_tokens AS DOUBLE)
       |    ELSE CAST(avail_tokens AS DOUBLE) * (1.0 + $rStar *
       |      (1.0 - EXP(-(ep - 1.0) / $rStar))) END, 2)
       |    AS effective_tokens,
       |  ROUND(CASE WHEN alloc_tokens > 0 THEN
       |    (CASE WHEN ep <= 1.0 THEN CAST(alloc_tokens AS DOUBLE)
       |      ELSE CAST(avail_tokens AS DOUBLE) * (1.0 + $rStar *
       |        (1.0 - EXP(-(ep - 1.0) / $rStar))) END) /
       |    CAST(alloc_tokens AS DOUBLE) END, 6) AS efficiency
       |FROM e ORDER BY stratum""".stripMargin
}
