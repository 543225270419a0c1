package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: render every query's physical plan and flag scale
  * anti-patterns — nested-loop/cartesian joins where a hash join was
  * expected, plus plans that fail to construct at all. Intentional
  * nested loops (query-vs-candidate cross products against a broadcast
  * side) are allowlisted.
  *
  * Runs two ways: `runMain graft.PlanAudit [sfDir]` for the verbose
  * dev report, and [[PlanAudit.audit]] inside PlanAuditSpec so a plan
  * regression (an operator silently degrading to NLJ) fails `sbt test`,
  * not just a manual check.
  */
object PlanAudit {

  /** Queries whose cross/NLJ shape is by design: a tiny broadcast query
    * set against every candidate (brute-force similarity, PQ ADC
    * scoring), a 1-row broadcast corpus-stats factor (BM25), or an
    * explicit bounded all-pairs block. */
  val intentionalNlj = Set(
    "q19_ngram_jaccard", "q20_embedding_topk", "q21_ivf_ann",
    "q22_embedding_neardup", "q58_pq_ann", "q59_bm25_search", "q67_tfidf",
    "q81_lm_score", "q84_hybrid_rrf", "q103_containment",
    // Vocab.build's corpus-total denominator is a 1-row broadcast
    // crossJoin (same shape as the BM25/TF-IDF stats factors)
    "q108_vocab", "q109_oov", "q117_zipf",
    // sketch-threshold tiles: the percentile_approx threshold arrays
    // are a 1-row broadcast crossJoin (same stats-factor shape)
    "q128_rfm_approx", "q129_curriculum_approx",
    // skew profile: 1-row stats frame × 1-row hottest-key frame
    "q145_skew_advisor",
    // dataset card: 1-row base agg × 1-row entropy × 1-row top-stratum
    "q167_corpus_card",
    // pagerank: per-iteration dangling mass is a 1-row broadcast
    // crossJoin (stat factor, same shape as the corpus totals above)
    "q150_pagerank",
    // JL recall probe: tiny broadcast query set × candidates, the
    // same bounded brute-force eval harness as q20/q22
    "q175_random_projection",
    // HLL overlap matrix: |slices|² pairing of postcard-sized sketch
    // rows (slice_a < slice_b inequality join on a ~5-row frame)
    "q176_audience_overlap",
    // KS: the (n_a, n_b) totals are a 1-row broadcast stat factor
    // into the cumulative table (same shape as the corpus totals)
    "q178_ks_drift", "q179_ks_drift_grid",
    // MI grand-total is a 1-row broadcast crossJoin into the joint
    // cell table (the ksBySliceFdr joined-stat-tables workaround)
    "q216_mutual_info",
    // JS matrix: |S|² source-pair grid (the q176 postcard-pairing
    // shape); PMI: 1-row user-day-total stat factor; burstiness:
    // |types|×|days| calendar grid spine
    "q237_js_divergence", "q238_session_pmi", "q240_burstiness",
    // whitened-ANN probe rides the q20 bounded brute-force harness
    "q246_whitened_ann",
    // KM: the (max date, cohort size) pair is a 1-row stat factor;
    // log-rank adds the cohort-totals factor; CUPED's midpoint date
    // is the same 1-row shape
    "q247_kaplan_meier", "q251_log_rank", "q252_cuped", "q267_did",
    // segment lift: BH family-size 1-row factor (ksBySliceFdr shape);
    // quantile lift: |levels|-row broadcast quantile table
    "q256_segment_lift", "q257_quantile_lift",
    // retention decay: offset × window-length calendar² coverage join
    // + the 1-row max-date factor; LTV shares the max-date factor
    "q261_retention_decay", "q263_ltv_curve",
    // retrieval eval rides the q20 bounded brute-force harness
    "q184_retrieval_eval",
    // LSH quality harness: exact-Jaccard ground truth is a bounded
    // all-pairs block on the doc_id slice (the q19 pattern)
    "q186_dedup_eval",
    // join advisor: the three 1-row stat frames (left/right/shared)
    // assemble via crossJoin — stat factors, not data products
    "q190_join_cardinality",
    // DSIR: distribution totals and the top-k threshold are 1-row
    // broadcast stat factors
    "q153_dsir_select",
    // ROC curve: the (P, N) class totals are a 1-row broadcast stat
    // factor into the bounded distinct-score table (the KS shape)
    "q205_roc_curve",
    // ACF: series mean/denominator are 1-row broadcast stat factors
    // and the lag spine is a maxLag-row broadcast cross into the
    // day-cardinality table
    "q213_daily_acf",
    // conformal gate: the calibration threshold is a 1-row broadcast
    // stat factor into the eval aggregate
    "q219_conformal",
    // bootstrap: the full-data point estimate is a 1-row broadcast
    // stat factor beside the replicate-mean aggregate
    "q221_bootstrap_ci",
    // ks-fdr: grand total and test count are 1-row broadcast stat
    // factors; the slice×bucket grid is a bounded deliberate cross
    "q225_ks_fdr",
    // CCF: series means/normalizer are 1-row stat factors, the lag
    // spine a (2L+1)-row broadcast cross into the daily table
    "q228_cross_correlation",
    // RBO: the depth spine × matched-token list is a deliberate
    // K²-bounded cross (≤10k rows)
    "q232_rbo_vocab",
    // Theil–Sen: day² pairwise slopes are a deliberate bounded cross;
    // the OLS row is a 1-row stat factor
    "q236_theil_sen",
    // Neyman: the Σ N·σ / total-rows row is a 1-row stat factor
    "q233_neyman_allocation",
    // lexical KL: the corpus grand total is a 1-row stat factor
    "q234_lexical_kl",
    // entropy rate: the transition grand total is a 1-row stat factor
    "q229_entropy_rate",
    // OLS trend (batch + streaming dashboard): the min-date origin is
    // a 1-row broadcast stat factor into the calendar×type table
    "q269_ols_trend", "q276_stream_trend",
    // breakpoint: candidate×day calendar² grid + 1-row pooled/origin
    // stat factors — bounded forever by the calendar
    "q270_breakpoint",
    // EB shrinkage: the (μ, M) prior is a 1-row broadcast stat factor
    "q272_eb_shrinkage",
    // Hill: the x_(k+1) threshold is a 1-row stat factor over k rows
    "q273_hill_tail",
    // skyline: the min/max span of the maximized dim is a 1-row
    // broadcast stat factor feeding the grid prune
    "q275_skyline",
    // winsorized Welch: the pooled p95 cap is a 1-row stat factor
    "q279_ab_winsorized",
    // Durbin–Watson: the min-date origin is the q269 1-row factor
    "q281_durbin_watson",
    // Shapley: the coalition lattice is 2^C-bounded (16 rows) — the
    // containment join, the C×2^C pair grid and the 1-row total
    // factor are all deliberate bounded crosses
    "q283_shapley_attribution",
    // NB fit rides the q240 calendar-grid spine cross
    "q284_nb_fit",
    // association: the grand-total and H(a) rows are 1-row stat
    // factors into the |a|×|b| cell table (the q216 recipe)
    "q286_association",
    // Mann–Kendall: the q236 calendar² pair cross + 1-row n/tie rows
    "q287_mann_kendall",
    // runs test: the exact-median row is a 1-row stat factor
    "q288_runs_test",
    // KW: the (N, ties) totals are a 1-row stat factor into the
    // per-group rank sums (the MWU/q216 shape)
    "q290_kruskal_wallis",
    // Ljung–Box rides q213's ACF crosses + its own 1-row day count
    "q291_ljung_box",
    // UniMax: 1-row (L, B) totals + 1-row water level into the
    // stratum-cardinality cap table
    "q293_unimax_budget",
    // AD: the (n_a, n_b, N) totals are a 1-row stat factor into the
    // pooled value-frequency table (the KS/q178 shape)
    "q295_ad_twosample",
    // DoReMi tilt: 1-row corpus total + 1-row normalizer into the
    // source-cardinality table
    "q299_doremi_weights",
    // EWMA chart (batch + streaming face): 1-row μ/σ stat factor into
    // the day table
    "q300_ewma_chart",
    "q306_stream_ewma",
    // Kendall τ: bounded nation-grain entity self-cross (q176 shape)
    "q301_kendall_tau",
    // basket affinity: 1-row distinct-order total into the pair table
    "q302_market_basket",
    // periodogram: 1-row μ/σ/n stat factor into the day table
    "q308_periodogram",
    // McNemar: 1-row span-midpoint stat factor into events
    "q310_mcnemar",
    // Nelson-Aalen: the q247 KM 1-row max-date/count stat factor
    "q312_nelson_aalen",
    // link prediction: 1-row span-midpoint stat factor into lineitem
    "q316_link_prediction",
    // Davies-Bouldin: 1-row DB/SSW/SST stat factors composed at the end
    "q318_davies_bouldin",
    // SQ8 ANN: broadcast tiny query set x corpus (the q20 baseline shape)
    "q320_sq8_ann",
    // IND discovery: column-count-bounded pair grid (12x12 cross)
    "q321_ind_discovery",
    // truncated recall: q20 baseline shape per m (broadcast query set)
    "q322_truncated_recall",
    // Friedman: 1-row treatment-count + chi2 stat factors
    "q325_friedman",
    // Theil decomposition: 1-row total + identity stat factors
    "q326_theil",
    // alignment/uniformity: two 1-row stat factors composed at the end
    "q330_alignment_uniformity",
    // kNN label noise: bounded probe sample x corpus (q20 shape)
    "q332_knn_label_noise",
    // Cochran Q: k-bounded treatment grid + 1-row stat factors
    "q334_cochran_q",
    // spectral summary: the periodogram's 1-row stats factor
    "q335_spectral_entropy",
    // LSH advisor: 8-row grid x 1-row measured-background factor
    "q337_lsh_advisor",
    // Brier decomposition: 1-row base-rate factor over <=10 bins
    "q339_brier",
    // effective data: the q293 UniMax 1-row budget/theta factors
    "q340_effective_data",
    // competing risks: the KM 1-row cohort-size factor
    "q341_competing_risks",
    // RDD: cross of the two 1-row side fits
    "q342_rdd",
    // Simpson audit: 1-row pooled-diff factor
    "q344_simpsons",
    // Youden: the ROC's 1-row totals factor
    "q345_youden",
    // chi2 residuals: the q286 bounded marginal grid cross + 1-row N
    "q346_chi2_residuals",
    // Bland-Altman: 1-row moments factor recounted over diffs
    "q347_bland_altman",
    // Hurst: 1-row origin-date + |sizes|-row fit factors
    "q349_hurst")

  final case class Audit(name: String, shuffles: Int,
      joins: Seq[(String, Int)], flagged: Boolean, error: Option[String])

  /** Cached relations hide their plans from `executedPlan.toString`
    * (an InMemoryTableScan prints as a leaf), so a query built over
    * eagerly persisted frames — the funnel's step frames — would
    * otherwise dodge the NLJ tripwire entirely. Collect every cached
    * plan reachable from `p`, crossing AQE wrappers and nested
    * caches. */
  private def cachedPlans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // a cached relation referenced from several scans (or nested inside
    // another cached plan) must be counted ONCE — otherwise chained
    // caches (funnel step frames, LSH signatures) double-count their
    // shuffles/joins in the audit numbers
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[
        org.apache.spark.sql.execution.SparkPlan, java.lang.Boolean]())
    def walk(q: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = q match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      val here = q match {
        case m: InMemoryTableScanExec if seen.add(m.relation.cachedPlan) =>
          val cp = m.relation.cachedPlan
          cp +: walk(cp)
        case _ => Seq.empty
      }
      here ++ kids.flatMap(walk)
    }
    walk(p)
  }

  /** Audit every contract query's physical plan at `sfDir`. */
  def audit(spark: SparkSession, sfDir: String): Seq[Audit] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val exec = fn(spark, sfDir).queryExecution.executedPlan
        val plan = (exec +: cachedPlans(exec)).map(_.toString).mkString("\n")
        def count(s: String) = s.r.findAllIn(plan).size
        val joins = Seq(
          "BroadcastHashJoin" -> count("BroadcastHashJoin"),
          "SortMergeJoin" -> count("SortMergeJoin"),
          "ShuffledHashJoin" -> count("ShuffledHashJoin"),
          "BroadcastNestedLoopJoin" -> count("BroadcastNestedLoopJoin"),
          "CartesianProduct" -> count("CartesianProduct"))
          .filter(_._2 > 0)
        val shuffles = count("Exchange hashpartitioning") +
          count("Exchange rangepartitioning")
        val badNlj =
          (count("BroadcastNestedLoopJoin") + count("CartesianProduct")) > 0 &&
            !intentionalNlj.contains(name)
        Audit(name, shuffles, joins, badNlj, None)
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).filter(_.nonEmpty)
            .map(_.linesIterator.next()).getOrElse(e.getClass.getName)
          Audit(name, 0, Nil, flagged = true, Some(msg))
      } finally {
        // fixture queries may persist frames eagerly (funnel steps);
        // drop them so later audits aren't measured over foreign caches
        spark.catalog.clearCache()
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val results = audit(spark, sfDir)
    results.foreach { a =>
      val joinStr = a.joins.map { case (k, v) => s"$k x$v" }.mkString(", ")
      val flag =
        if (a.error.isDefined) s"  <-- PLAN FAILED: ${a.error.get}"
        else if (a.flagged) "  <-- UNEXPECTED NLJ"
        else ""
      println(f"[audit] ${a.name}%-24s shuffles=${a.shuffles}%-2d joins=[$joinStr]$flag")
    }
    println(s"[audit] flagged=${results.count(_.flagged)}")
    spark.stop()
  }
}
