package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic stratified sampling — the data-mixing primitive of a
  * training pipeline: per-stratum quotas ("n docs per (lang, source)
  * cell") drawn reproducibly, so a re-run (or a different engine)
  * selects the same rows.
  *
  * The pseudo-random order is `md5(id)` — a stable content-free
  * permutation both Spark and the DuckDB oracle compute identically,
  * unlike `rand()` (non-deterministic) or engine hash functions
  * (implementation-specific). Ties broken by id.
  *
  * Scale shape: one shuffle on the strata columns, then a per-stratum
  * window rank with early cutoff. Strata are the natural partition of
  * a curation run (languages × sources — thousands of cells, not
  * billions), so the window never sees unbounded partitions; the
  * hot-key case (one giant stratum) is the same row_number shape as
  * top-k-per-group (q30), which AQE skew-split handles.
  */
object Sampling {

  /** Neyman-optimal sample allocation per stratum — how a fixed
    * labeling/eval budget SHOULD split across sources: proportional
    * allocation spends budget where rows are, Neyman (1934) spends it
    * where the variance is, allocating n_h ∝ N_h·σ_h, which minimizes
    * the stratified estimator's variance for a fixed total. The
    * report carries both allocations per stratum plus each stratum's
    * share of the Σ N·σ mass — the audit a sampling plan review reads
    * ("why does src3 get 4× its row share? its values swing 4× as
    * hard").
    *
    * One grouped agg over the corpus (count + population σ per
    * stratum), then stratum-cardinality arithmetic with the Σ N·σ
    * total as a 1-row stat factor. Allocations round half-up per
    * stratum (they may sum to budget ± strata/2 — the standard
    * apportionment slack a caller rounds off). */
  def neymanAllocation(df: DataFrame, strataCol: String,
      valueCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val per = df
      .groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(stddev_pop(col(valueCol)), lit(0.0)).as("__sd"))
      .withColumn("__mass", col("n_rows") * col("__sd"))
    val tot = per.agg(sum("__mass").as("__tm"), sum("n_rows").as("__tn"))
    // zero-variance corpus (every stratum constant) ⇒ Σ N·σ = 0: the
    // Neyman share is undefined, so fall back to proportional shares
    // explicitly rather than emit NULL/÷0 — mirrored in the oracle
    val share = when(col("__tm") > 0.0, col("__mass") / col("__tm"))
      .otherwise(col("n_rows").cast("double") / col("__tn"))
    per.crossJoin(broadcast(tot))   // 1-row stat factor
      .select(
        col("stratum"), col("n_rows"),
        round(col("__sd"), 4).as("sd"),
        round(share, 6).as("neyman_share"),
        round(share * budget, 0).cast("long").as("alloc_neyman"),
        round(col("n_rows").cast("double") / col("__tn") * budget, 0)
          .cast("long").as("alloc_proportional"))
      .orderBy("stratum")
  }

  /** DuckDB oracle for [[neymanAllocation]] on documents(source,
    * n_chars). */
  def neymanOracleSql(budget: Long): String =
    s"""WITH per AS (
       |  SELECT source AS stratum, COUNT(*) AS n_rows,
       |    COALESCE(stddev_pop(n_chars), 0.0) AS sd
       |  FROM documents GROUP BY 1),
       |tot AS (
       |  SELECT SUM(n_rows * sd) AS tm, SUM(n_rows) AS tn FROM per)
       |SELECT stratum,
       |  CAST(n_rows AS BIGINT) AS n_rows,
       |  ROUND(sd, 4) AS sd,
       |  ROUND(CASE WHEN (SELECT tm FROM tot) > 0
       |    THEN n_rows * sd / (SELECT tm FROM tot)
       |    ELSE CAST(n_rows AS DOUBLE) / (SELECT tn FROM tot) END, 6)
       |    AS neyman_share,
       |  CAST(ROUND(CASE WHEN (SELECT tm FROM tot) > 0
       |    THEN n_rows * sd / (SELECT tm FROM tot)
       |    ELSE CAST(n_rows AS DOUBLE) / (SELECT tn FROM tot) END
       |    * $budget, 0) AS BIGINT) AS alloc_neyman,
       |  CAST(ROUND(CAST(n_rows AS DOUBLE) / (SELECT tn FROM tot)
       |    * $budget, 0) AS BIGINT) AS alloc_proportional
       |FROM per ORDER BY stratum""".stripMargin

  /** Keep the first `n` rows of each stratum in md5 order. Appends
    * `sample_rank` (1-based within stratum). */
  def stratifiedN(df: DataFrame, strataCols: Seq[String], n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .filter(col("sample_rank") <= n)
  }

  /** Per-stratum counts before/after a quota — the mix report a
    * curation run logs. */
  def mixReport(df: DataFrame, strataCols: Seq[String], n: Int,
      idCol: String = "doc_id"): DataFrame = {
    val total = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_total"))
    val sampled = stratifiedN(df, strataCols, n, idCol)
      .groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_sampled"))
    total.join(sampled, strataCols)
      .orderBy(strataCols.map(col): _*)
  }

  /** Integer-weight upsampling: each row repeats `weights(key)` times
    * (keys absent from the map keep weight 1; weight 0 drops the row),
    * with a 1-based `epoch` column distinguishing the copies — the
    * "see high-quality sources N times per training epoch" mixing
    * primitive. Map-only (generate, no shuffle): the weight lookup is a
    * literal CASE over the handful of configured keys, so at 100 TB
    * this streams through the scan and multiplies rows in place. */
  def upsampleByWeight(df: DataFrame, weights: Map[String, Int],
      keyCol: String = "source"): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be >= 0")
    val w = weights.foldLeft(lit(1)) { case (acc, (k, v)) =>
      when(col(keyCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("__w", w)
      .filter(col("__w") >= 1)    // sequence(1, 0) would run DOWNWARD
      .withColumn("epoch", explode(expr("sequence(1, __w)")))
      .withColumn("epoch", col("epoch").cast("bigint"))
      .drop("__w")
  }

  /** Deterministic train/val/test assignment by md5(id) hex order: the
    * first `fractions` share of hash space (lexicographic, uniform)
    * goes to split 1, and so on — reproducible across engines and
    * stable under corpus growth (a doc's split never changes when
    * other docs arrive, unlike rank-based splits). Map-only. */
  def hashSplit(df: DataFrame, splits: Seq[(String, Double)],
      idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    // zero-weight splits get no hash range at all — kept in the list
    // they'd also push a cumulative fraction to 1.0 BEFORE the last
    // split, whose bound would format as the 9-hex-digit "100000000"
    // and lexicographically misroute most of the hash space
    val active = splits.filter(_._2 > 0.0)
    val h = md5(col(idCol).cast("string"))
    // cumulative thresholds as 8-hex-digit prefixes of the hash space,
    // clamped into it (a last-init fraction of exactly 1.0 is 2^32)
    val cum = active.scanLeft(0.0)(_ + _._2).tail
    val bounds = cum.init.map(f =>
      f"${math.min((f * (1L << 32)).toLong, (1L << 32) - 1)}%08x")
    val expr0 = active.init.zip(bounds).foldRight(
      lit(active.last._1): org.apache.spark.sql.Column) {
      case (((name, _), b), acc) =>
        when(substring(h, 1, 8) < b, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr0)
  }

  /** Leakage-proof train/val/test split: assignment hashed on the
    * duplicate-CLUSTER id instead of the document id, so near-duplicate
    * documents can never straddle a split boundary — the standard
    * guard against test-set contamination via duplicates ([[hashSplit]]
    * alone routes two near-identical docs independently, and at web
    * scale some pair WILL land train/test). `clusters` is
    * [[DupClusters.clusterDocuments]] output (idCol, cluster_id, …).
    * Output: (idCol, clusterCol, split), id-sorted.
    *
    * Scale shape: one equi-join on the id key, then the same map-only
    * md5-prefix CASE as [[hashSplit]] evaluated on the cluster id —
    * no extra shuffle over plain hashSplit beyond the label join a
    * cluster-aware pipeline has already paid for. */
  def clusterSplit(docs: DataFrame, clusters: DataFrame,
      splits: Seq[(String, Double)], idCol: String = "doc_id",
      clusterCol: String = "cluster_id"): DataFrame = {
    val labeled = docs.select(col(idCol))
      .join(clusters.select(col(idCol), col(clusterCol)), idCol)
    hashSplit(labeled, splits, clusterCol)
      .select(col(idCol), col(clusterCol), col("split"))
      .orderBy(idCol)
  }

  /** Split-leakage audit: of the near-dup candidate pairs, how many
    * STRADDLE a split boundary (one side train, the other val/test)?
    * The number [[clusterSplit]] drives to zero by construction and
    * plain [[hashSplit]] leaves at ~2·f·(1-f) of pairs — run both ways,
    * this report is the evidence a split is (or is not) leaking
    * near-duplicate eval docs into training. Output: one row —
    * (n_pairs, n_straddling, straddle_rate).
    *
    * Scale shape: two equi-joins of the PAIR table (the bounded
    * candidate output of LSH/affix generation, orders of magnitude
    * smaller than the corpus) against the (id, split) assignment,
    * then one global agg — no all-pairs, no window. */
  def splitStraddleAudit(pairs: DataFrame, assign: DataFrame,
      idCol: String = "doc_id", splitCol: String = "split",
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    val a = assign.select(col(idCol).as(srcCol), col(splitCol).as("__sa"))
    val b = assign.select(col(idCol).as(dstCol), col(splitCol).as("__sb"))
    pairs.select(srcCol, dstCol)
      .join(a, srcCol).join(b, dstCol)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L))
          .as("n_straddling"))
      .withColumn("straddle_rate",
        when(col("n_pairs") > 0,
          round(col("n_straddling").cast("double") / col("n_pairs"), 6))
          .otherwise(lit(0.0)))
  }

  /** Temperature-based mixture reweighting (the multilingual-corpus
    * sampling rule of XLM-R/mT5: stratum share q_i ∝ p_i^alpha, alpha
    * in (0,1] — alpha=1 keeps the natural mix, smaller alpha flattens
    * it toward uniform, boosting tail strata without letting any head
    * stratum dominate). Output per stratum: natural share `p`,
    * resampled share `q`, `weight` = q/p (the up/down-sampling factor
    * to feed [[upsampleByWeight]]-style expansion), and `target_n` =
    * round(q·N).
    *
    * Scale shape: one count shuffle on the strata columns; the window
    * normalizations run over the post-agg strata table (languages ×
    * sources — thousands of rows, not corpus-sized), so the
    * single-partition window is bounded by construction. */
  def temperatureMix(df: DataFrame, strataCols: Seq[String],
      alpha: Double = 0.3): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val w = Window.partitionBy()
    val counts = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
    counts
      .withColumn("__total", sum(col("n_docs")).over(w))
      .withColumn("__p", col("n_docs") / col("__total"))
      .withColumn("__q",
        pow(col("__p"), alpha) / sum(pow(col("__p"), alpha)).over(w))
      .select(strataCols.map(col) ++ Seq(
        col("n_docs"),
        round(col("__p"), 6).as("p"),
        round(col("__q"), 6).as("q"),
        round(col("__q") / col("__p"), 4).as("weight"),
        round(col("__q") * col("__total")).cast("bigint").as("target_n")): _*)
      .orderBy(strataCols.map(col): _*)
  }

  /** Per-group quantile filter, EXACT: keep each group's top
    * `keepFraction` rows by `scoreCol` — "keep the best half per
    * language", the quality-threshold curation step after a scorer
    * ([[graft.functions.TextFunctions.qualityScore]],
    * [[QualityModel]]) has run. percent_rank over (score desc,
    * tieBreak asc) makes the cut deterministic under score ties.
    *
    * Scale note: each group ranks in one window task, so this exact
    * form assumes a BOUNDED group set (languages, sources). For
    * groups of unbounded cardinality-skew use [[quantileKeepApprox]] —
    * same contract, sketch threshold, no per-group sort. */
  def quantileKeep(df: DataFrame, scoreCol: String, groupCols: Seq[String],
      keepFraction: Double, tieBreak: Seq[String]): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      "keepFraction must be in (0, 1]")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc +: tieBreak.map(col(_).asc): _*)
    // inclusive cut: percent_rank is (rank-1)/(n-1), so the group's
    // best row is always 0 and its worst is always 1 — `<=` keeps a
    // singleton group and makes keepFraction=1 keep everything
    df.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") <= keepFraction)
      .drop("__pr")
  }

  /** Scale path of [[quantileKeep]]: per-group score threshold from
    * `percentile_approx` (one grouped agg, mergeable sketch, no
    * per-group sort), broadcast back, filter `score >= threshold`.
    * Keep-rate is approximate at the sketch's accuracy; the exact and
    * approx forms agree on skewless fixtures (spec-pinned). */
  def quantileKeepApprox(df: DataFrame, scoreCol: String,
      groupCols: Seq[String], keepFraction: Double,
      accuracy: Int = 10000): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      "keepFraction must be in (0, 1]")
    val thresholds = df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(scoreCol), lit(1.0 - keepFraction),
        lit(accuracy)).as("__thr"))
    df.join(broadcast(thresholds), groupCols)
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Curriculum sharding: assign each row to one of `nShards`
    * difficulty tiers by `scoreCol` order (ascending = easy first) —
    * the data-prep step of curriculum learning, where training reads
    * shard 1 before shard 2 before shard 3. NTILE gives equal-sized
    * tiers (earlier tiers take the remainder), and the tie-break
    * column makes the assignment deterministic.
    *
    * Scale note: the single NTILE window is a global sort; for
    * corpus-scale inputs prefer binning on [[quantileKeepApprox]]-style
    * sketch thresholds. This exact form is for the curated post-filter
    * set, which is orders of magnitude smaller. */
  def curriculumShards(df: DataFrame, scoreCol: String, nShards: Int,
      tieBreak: Seq[String]): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val w = Window.orderBy(col(scoreCol).asc +: tieBreak.map(col(_).asc): _*)
    df.withColumn("shard", ntile(nShards).over(w))
  }

  /** Scale path of [[curriculumShards]]: shard boundaries from one
    * `percentile_approx` agg (mergeable sketch), broadcast back as a
    * tiny array, each row assigned map-side by counting boundaries
    * strictly below its score — no global sort, no single-task window.
    * This is the shape for corpus-scale curriculum prep: the exact
    * NTILE form sorts the whole corpus in one task; this form's only
    * cost is one pass for the sketch and one map-side pass to assign.
    *
    * Ties land in the same shard (boundaries can't split equal
    * scores), so shard sizes are approximately equal under ties. On
    * tie-free inputs with count below `accuracy` the sketch is exact
    * and assignments equal [[curriculumShards]] exactly (spec-pinned):
    * the exact-path percentile at p=k/n is the value at ascending rank
    * ceil(p·count) — NTILE's shard-k upper boundary. */
  def curriculumShardsApprox(df: DataFrame, scoreCol: String, nShards: Int,
      accuracy: Int = 10000): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    if (nShards == 1) df.withColumn("shard", lit(1))
    else {
      val thr = df.agg(percentile_approx(col(scoreCol).cast("double"),
        tileProbs(nShards), lit(accuracy)).as("__thr"))
      df.crossJoin(broadcast(thr))
        .withColumn("shard", tileBucket(col(scoreCol).cast("double"),
          col("__thr")))
        .drop("__thr")
    }
  }

  /** The sketch-tile primitive shared by [[curriculumShardsApprox]]
    * and [[Retention.rfmSegmentsApprox]]: interior tile boundaries at
    * p = k/n for `percentile_approx`, and the map-side bucket
    * expression — 1 + the count of boundaries STRICTLY below the
    * value. The semantics both call sites rely on live here once:
    * 1-based buckets; ties share a bucket (thresholds can't split
    * equal values); on tie-free inputs whose count is under the sketch
    * accuracy the boundary at p = k/n is the value at ascending rank
    * ceil(p·count) — exactly NTILE's tile-k upper boundary, so the
    * bucketing equals the exact NTILE form (spec-pinned in
    * ApproxTilesSpec). */
  private[operators] def tileProbs(n: Int): Column =
    array((1 until n).map(k => lit(k.toDouble / n)): _*)

  private[operators] def tileBucket(v: Column, thresholds: Column): Column =
    aggregate(thresholds, lit(1),
      (acc, t) => acc + when(v > t, lit(1)).otherwise(lit(0)))

  /** Weighted sampling WITHOUT replacement, k rows, deterministic:
    * Efraimidis–Spirakis exponential-sort (VLDB '06 / IPL '06) — each
    * row draws u ∈ (0,1) and survives by key u^(1/weight); the top-k
    * keys are a weighted sample without replacement. The "random" u is
    * derived from md5(id) (first 8 hex digits / 2³²), so the sample is
    * reproducible across engines and runs — the same oracleable-
    * randomness trick as the md5-order stratified quotas.
    *
    * Scale shape: key computation is map-side; `orderBy(...).limit(k)`
    * plans as TakeOrderedAndProject — per-partition top-k then a
    * driver merge of k·partitions rows, never a global sort. */
  def weightedSample(df: DataFrame, weightCol: String, k: Int,
      idCol: String): DataFrame = {
    require(k > 0, "sample size must be positive")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    df.withColumn("__key", pow(u, lit(1.0) / col(weightCol)))
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
      .drop("__key")
  }

  /** Freshness-decayed mixing weights: each row contributes
    * `pow(0.5, age_days / halfLifeDays)` where age is measured from the
    * pinned `asOf` timestamp — the recency-weighted variant of the
    * natural mix (training sets routinely overweight recent crawl
    * snapshots; exponential half-life decay is the standard curve).
    * Output per stratum: raw count, decayed weight mass, decayed value
    * mass, and the decayed share of the whole.
    *
    * Deterministic by construction (pinned `asOf`, no wall clock), so
    * the whole report is oracle-checkable. Scale shape: the decay
    * factor is a per-row map-side expression folded into ONE grouped
    * aggregate — no window, no join; the share normalization runs over
    * the post-agg strata table only. */
  /** Token-budget corpus fill: per stratum, take documents in the
    * md5(id) pseudo-random order until their cumulative `costCol`
    * (token/char count) reaches the stratum's budget — "sample N
    * tokens per domain", the budget-denominated counterpart of
    * [[stratifiedN]]'s row quotas, and how training mixes are actually
    * specified (token budgets, not document counts). The fill stops at
    * the first document that would cross the budget — PREFIX semantics:
    * later, smaller documents are not back-filled, so the selection is
    * a stable prefix of the order (back-filling would let one new
    * arrival reshuffle which tail docs fit) and the kept mass never
    * exceeds the budget. Budgets: `budget` for every
    * stratum, overridable per value of `strataCols.head` via
    * `overrides` (the [[upsampleByWeight]] literal-CASE pattern).
    * Appends `cum_cost`, the running post-inclusion total.
    *
    * Deterministic (md5 order, ties by id) hence fully oracle-checkable.
    * Scale shape: one shuffle on the strata columns, then a running-sum
    * window per stratum — the same bounded-strata contract as
    * [[stratifiedN]] (languages × sources: thousands of cells, not
    * billions), with AQE skew-split covering a hot stratum. The filter
    * keeps only in-budget rows, so downstream stages see the budgeted
    * corpus, not the full scan. */
  def budgetFill(df: DataFrame, strataCols: Seq[String], costCol: String,
      budget: Long, overrides: Map[String, Long] = Map.empty,
      idCol: String = "doc_id"): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(budget > 0 && overrides.values.forall(_ > 0),
      "budgets must be positive")
    val b = overrides.foldLeft(lit(budget)) { case (acc, (k, v)) =>
      when(col(strataCols.head) === k, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_cost", sum(col(costCol)).over(w).cast("bigint"))
      .filter(col("cum_cost") <= b)
  }

  def decayedMix(df: DataFrame, strataCols: Seq[String], tsCol: String,
      valueCol: String, asOf: String, halfLifeDays: Double): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(halfLifeDays > 0.0, "half-life must be positive")
    val ageDays = (unix_timestamp(lit(asOf).cast("timestamp")) -
      unix_timestamp(col(tsCol))) / 86400.0
    val decay = pow(lit(0.5), ageDays / halfLifeDays)
    val agged = df.groupBy(strataCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(decay).as("__w"),
        sum(decay * col(valueCol)).as("__wv"))
    agged
      .withColumn("__total", sum(col("__w")).over(Window.partitionBy()))
      .select(strataCols.map(col) ++ Seq(
        col("n_rows"),
        round(col("__w"), 4).as("decayed_weight"),
        round(col("__wv"), 4).as("decayed_value"),
        round(col("__w") / col("__total"), 6).as("decayed_share")): _*)
      .orderBy(strataCols.map(col): _*)
  }

  /** Effective sample size of a weighted stratum (Kish 1965):
    * ESS = (Σw)²/Σw² — how many EQUAL-weight rows the weighted set is
    * statistically worth. A source with 10k docs but ESS 40 is "a few
    * giants wearing a crowd costume"; every importance-weighted mix
    * (q74/q82/q153) should publish this next to its raw counts.
    * Returns `(stratum, n_rows, total_w, ess, ess_ratio)` per
    * stratum, ordered. Integer weights keep Σw/Σw² exact in both
    * engines; the division happens once, in double.
    *
    * Scale shape: one grouped aggregate, stratum-cardinality out. */
  def effectiveSampleSize(df: DataFrame, stratumCol: String,
      weightCol: String): DataFrame = {
    val w = col(weightCol).cast("long")
    df.groupBy(col(stratumCol).as("stratum"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(w).as("total_w"),
        sum(w * w).as("__sww"))
      .select(col("stratum"), col("n_rows"), col("total_w"),
        round(when(col("__sww") > 0L,
          col("total_w").cast("double") * col("total_w") / col("__sww")),
          6).as("ess"),
        round(when(col("__sww") > 0L,
          col("total_w").cast("double") * col("total_w") /
            col("__sww") / col("n_rows")), 6).as("ess_ratio"))
      .orderBy("stratum")
  }

  /** DuckDB oracle for [[effectiveSampleSize]] on documents by lang,
    * weighted by n_chars. */
  val essOracleSql: String =
    """SELECT lang AS stratum, COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_w,
      |  ROUND(CASE WHEN SUM(n_chars * n_chars) > 0 THEN
      |    CAST(SUM(n_chars) AS DOUBLE) * SUM(n_chars) /
      |      SUM(n_chars * n_chars) END, 6) AS ess,
      |  ROUND(CASE WHEN SUM(n_chars * n_chars) > 0 THEN
      |    CAST(SUM(n_chars) AS DOUBLE) * SUM(n_chars) /
      |      SUM(n_chars * n_chars) / COUNT(*) END, 6) AS ess_ratio
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mass-weighted length quantiles per stratum: the smallest value v
    * such that rows with value ≤ v carry ≥ q of the stratum's TOTAL
    * weight. For doc length weighted by itself this answers "half the
    * corpus TOKENS live in docs shorter than ___" — the packing and
    * truncation planner's number, which the unweighted median (half
    * the DOCUMENTS) badly misstates under heavy tails. Returns
    * `(stratum, n_docs, total_mass, wp25, wp50, wp75)`.
    *
    * Scale shape — a cumulative window over RAW documents would make
    * each stratum one giant window partition (the single-task trap
    * the [[Concentration]] Gini avoids), so the engine aggregates to
    * the (stratum, value) HISTOGRAM first: integer lengths bound the
    * histogram by the longest document, not the corpus. The
    * cumulative-mass window then runs over histogram rows (RANGE
    * frame — tie-safe by construction since equal values are ONE
    * row), and the quantile thresholds compare in exact integer
    * arithmetic (4·cum ≥ tot), no FP boundary to disagree on. */
  def weightedQuantiles(df: DataFrame, stratumCol: String,
      valueCol: String, weightCol: String): DataFrame = {
    val hist = df
      .select(col(stratumCol).as("stratum"),
        col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .groupBy("stratum", "v")
      .agg(count(lit(1)).as("__c"), sum("w").as("__w"))
    // per-stratum totals as a joined stat table, not a second
    // unbounded window (the Spark 4.1 stacked-window footgun)
    val tot = hist.groupBy("stratum")
      .agg(sum("__w").as("__tot"), sum("__c").as("__n"))
    val marked = hist
      .withColumn("__cw", sum("__w").over(
        Window.partitionBy("stratum").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(tot), Seq("stratum"))
    marked.groupBy("stratum")
      .agg(
        max("__n").as("n_docs"),
        max("__tot").as("total_mass"),
        min(when(col("__cw") * 4L >= col("__tot"), col("v"))).as("wp25"),
        min(when(col("__cw") * 2L >= col("__tot"), col("v"))).as("wp50"),
        min(when(col("__cw") * 4L >= col("__tot") * 3L, col("v")))
          .as("wp75"))
      .orderBy("stratum")
  }

  /** DuckDB oracle for [[weightedQuantiles]] on documents:
    * lang-stratified, n_chars weighted by itself. Quantile thresholds
    * compare in EXACT integer arithmetic (4·cum ≥ tot), so there is
    * no FP boundary to disagree on. */
  val weightedQuantilesOracleSql: String =
    """WITH m AS (
      |  SELECT lang AS stratum, n_chars AS v, n_chars AS w,
      |    SUM(n_chars) OVER (PARTITION BY lang ORDER BY n_chars
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    SUM(n_chars) OVER (PARTITION BY lang) AS tot
      |  FROM documents)
      |SELECT stratum, COUNT(*) AS n_docs,
      |  CAST(MAX(tot) AS BIGINT) AS total_mass,
      |  CAST(MIN(CASE WHEN cw * 4 >= tot THEN v END) AS BIGINT) AS wp25,
      |  CAST(MIN(CASE WHEN cw * 2 >= tot THEN v END) AS BIGINT) AS wp50,
      |  CAST(MIN(CASE WHEN cw * 4 >= tot * 3 THEN v END) AS BIGINT)
      |    AS wp75
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  /** Balanced per-class downsample to the MINORITY class size — the
    * classifier-training counterpart of [[stratifiedBySource]]
    * (which preserves shares; this one equalizes them): every class
    * keeps its first `m = min class count` rows in deterministic
    * `orderCol` order. Returns the per-class audit `(cls, n_total,
    * n_kept, id_checksum, mean_kept_metric)` rather than the kept
    * rows themselves — the checksum (sum of kept ids) pins the
    * EXACT selected set across engines, which is the point of the
    * deterministic order.
    *
    * Scale shape: one grouped count (class cardinality, broadcast
    * min), one per-class window capped at m — the window sorts
    * within class partitions only, and at 100 TB the same contract
    * holds by pre-bucketing on cls before the window. */
  def balancedByClass(df: DataFrame, clsCol: String,
      orderCol: String, metricCol: String): DataFrame = {
    val counts = df.groupBy(col(clsCol).as("cls"))
      .agg(count(lit(1)).as("n_total"))
    val m = counts.agg(min("n_total").as("__m"))
    val w = Window.partitionBy(col(clsCol))
      .orderBy(col(orderCol))
    val kept = df
      .withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(m))
      .filter(col("__rn") <= col("__m"))
      .groupBy(col(clsCol).as("cls"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col(orderCol)).as("id_checksum"),
        round(avg(col(metricCol).cast("double")), 6)
          .as("mean_kept_metric"))
    counts.join(kept, Seq("cls"))
      .select(col("cls"), col("n_total"), col("n_kept"),
        col("id_checksum").cast("bigint").as("id_checksum"),
        col("mean_kept_metric"))
      .orderBy("cls")
  }

  /** DuckDB oracle for [[balancedByClass]] on documents
    * (cls = lang, order = doc_id, metric = n_chars). */
  val balancedByClassOracleSql: String =
    """WITH c AS (
      |  SELECT lang AS cls, COUNT(*) AS n_total
      |  FROM documents GROUP BY 1),
      |m AS (SELECT MIN(n_total) AS m FROM c),
      |r AS (
      |  SELECT lang AS cls, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id)
      |      AS rn
      |  FROM documents),
      |kept AS (
      |  SELECT cls, COUNT(*) AS n_kept,
      |    SUM(doc_id) AS id_checksum,
      |    ROUND(AVG(CAST(n_chars AS DOUBLE)), 6)
      |      AS mean_kept_metric
      |  FROM r CROSS JOIN m WHERE rn <= m.m GROUP BY 1)
      |SELECT c.cls, c.n_total, kept.n_kept,
      |  CAST(kept.id_checksum AS BIGINT) AS id_checksum,
      |  kept.mean_kept_metric
      |FROM c JOIN kept ON c.cls = kept.cls
      |ORDER BY c.cls""".stripMargin
}
