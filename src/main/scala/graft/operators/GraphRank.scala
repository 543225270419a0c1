package graft.operators

import graft.util.Checkpoints.TruncateOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Link-graph importance (PageRank) over the clickstream navigation
  * graph — the corpus-curation signal CommonCrawl-style pipelines use
  * to weight documents by the link authority of their origin page
  * (Brin & Page '98; the harmonic/centrality weighting in CCNet,
  * Wenzek et al. 2020). The reference's web_events domain
  * (`stg_web_events.sql`, `samples/web_events.json`) carries the
  * per-event page payload this graph is built from.
  *
  * Scale shape (the part that must survive 100 TB of events):
  *   - Edge extraction is ONE shuffle on the user key (sequences are
  *     per-user), then an edge-level aggregation whose output is
  *     |pages|² at worst — graph-sized, not event-sized.
  *   - The iteration joins `edges ⋈ ranks` on `src`. Edges are
  *     repartitioned on `src` once and persisted; every iteration
  *     reuses that partitioning, so the per-iteration cost is a
  *     shuffle of the RANK table only (|nodes| rows), never the edge
  *     set. This is the standard Pregel-style dataflow expressed as
  *     Catalyst joins.
  *   - Dangling mass is a 1-row aggregate broadcast back via a 1-row
  *     cross join (a stat factor, not a data-sized cross product).
  *   - Ranks are rounded to 9 decimals each iteration: double
  *     summation order differs across engines/partitionings at
  *     ~1e-15, and the per-iteration round keeps the fixpoint
  *     bit-identical and engine-independent (same contract as the
  *     oracle SQL, which rounds identically).
  */
object GraphRank {

  /** Per-user navigation edges from the event stream: consecutive
    * (page → page) transitions with multiplicity. The page id rides in
    * the JSON props payload (`$.k`), mirroring the reference's
    * web_events `metadata` carry-through. Tie-break on `event_id`
    * makes the sequence total-ordered and the edge table
    * deterministic. */
  def navigationEdges(events: DataFrame,
      key: String = "user_id", ts: String = "ts",
      propsCol: String = "props"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("event_id"))
    events
      .withColumn("__page", get_json_object(col(propsCol), "$.k").cast("int"))
      // Drop payload-less events BEFORE the window: a missing page id
      // must not sever the user's navigation chain around it.
      .where(col("__page").isNotNull)
      .withColumn("__next", lead(col("__page"), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col("__page").as("src"), col("__next").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Damped PageRank with dangling-mass redistribution, fixed
    * iteration count. Returns `(page, rank)` with rank rounded to 6
    * decimals, ordered by page.
    *
    * Each iteration TRUNCATES LINEAGE with an eager
    * `localCheckpoint`, not just persist+count: the rank table is
    * referenced twice per step (dangling mass + contributions), so a
    * cache alone leaves the LOGICAL plan doubling every iteration —
    * execution stays cached-fast but Catalyst re-analyzes a tree
    * that is 2^k base plans wide (measured: 41 s of pure driver
    * analysis for 5 iterations on a 100-node graph vs ~1 s with the
    * checkpoint). On a fault-tolerant cluster deployment prefer
    * `checkpoint()` to a reliable store; local mode has no executor
    * loss to recover from. */
  def pagerank(spark: SparkSession, edges: DataFrame,
      iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    val e = edges
      .withColumn("share",
        col("w").cast("double") / sum(col("w")).over(
          Window.partitionBy(col("src"))))
      .select("src", "dst", "share")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nodes = e.select(col("src").as("page"))
      .union(e.select(col("dst").as("page")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble

    // Nodes with at least one outgoing edge; everything else is
    // dangling and its mass is redistributed uniformly each step.
    val outNodes = e.select(col("src").as("page")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
      .truncateLineage()

    for (_ <- 1 to iterations) {
      val dangling = ranks.join(outNodes, Seq("page"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contrib = e.join(ranks, e("src") === ranks("page"))
        .groupBy(col("dst").as("page"))
        .agg(sum(col("share") * col("rank")).as("__c"))
      ranks = nodes
        .join(contrib, Seq("page"), "left_outer")
        .crossJoin(broadcast(dangling))
        .withColumn("rank", round(
          lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / lit(n)), 9))
        .select("page", "rank")
        .truncateLineage()
    }

    val out = ranks
      .withColumn("rank", round(col("rank"), 6))
      .orderBy(col("page"))
    e.unpersist(); nodes.unpersist(); outNodes.unpersist()
    out
  }

  /** The registered query: navigation PageRank over `events`. */
  def navigationRank(spark: SparkSession, events: DataFrame,
      iterations: Int = 5, damping: Double = 0.85): DataFrame =
    pagerank(spark, navigationEdges(events), iterations, damping)

  /** Personalized (topic-sensitive) PageRank: the teleport vector
    * concentrates on `seeds` instead of spreading uniformly
    * (Haveliwala, WWW 2002) — "importance AS SEEN FROM these pages",
    * the relevance weighting a curation pipeline uses to score pages
    * by proximity to a trusted seed set (TrustRank, Gyöngyi et al.
    * VLDB 2004, is exactly this with seeds = vetted sites). Same
    * Pregel-shaped dataflow as [[pagerank]]: edges partitioned once,
    * only the rank table moves per iteration; the seed set rides as a
    * broadcast membership flag.
    *
    * Differences from the uniform walk, both load-bearing: restart
    * mass (1−d) goes to seeds only, and DANGLING mass also re-enters
    * through the teleport (the standard strongly-preferential
    * handling) — so non-seed pages earn rank only through actual
    * navigation paths from the seeds. */
  def personalizedRank(spark: SparkSession, edges: DataFrame,
      seeds: Seq[Int], iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed page")
    import spark.implicits._
    val e = edges
      .withColumn("share",
        col("w").cast("double") / sum(col("w")).over(
          Window.partitionBy(col("src"))))
      .select("src", "dst", "share")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("page"))
      .union(e.select(col("dst").as("page")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    val outNodes = e.select(col("src").as("page")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedDf = seeds.toDF("page")
    val s = seeds.size.toDouble

    val isSeed = col("__seed").isNotNull
    def withSeedFlag(df: DataFrame): DataFrame =
      df.join(broadcast(seedDf.withColumn("__seed", lit(1))),
        Seq("page"), "left_outer")

    var ranks = withSeedFlag(nodes)
      .withColumn("rank", when(isSeed, lit(1.0 / s)).otherwise(lit(0.0)))
      .select("page", "rank")
      .truncateLineage()

    for (_ <- 1 to iterations) {
      val dangling = ranks.join(outNodes, Seq("page"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contrib = e.join(ranks, e("src") === ranks("page"))
        .groupBy(col("dst").as("page"))
        .agg(sum(col("share") * col("rank")).as("__c"))
      ranks = withSeedFlag(nodes)
        .join(contrib, Seq("page"), "left_outer")
        .crossJoin(broadcast(dangling))
        .withColumn("rank", round(
          when(isSeed, lit((1.0 - damping) / s) +
            lit(damping) * col("__dm") / lit(s)).otherwise(lit(0.0)) +
            lit(damping) * coalesce(col("__c"), lit(0.0)), 9))
        .select("page", "rank")
        .truncateLineage()
    }
    val out = ranks
      .withColumn("rank", round(col("rank"), 6))
      .orderBy(col("page"))
    e.unpersist(); nodes.unpersist(); outNodes.unpersist()
    out
  }

  /** DuckDB oracle for [[personalizedRank]] over the navigation
    * edges — same chained-CTE unrolling as [[oracleSql]], seeded
    * teleport. */
  def personalizedOracleSql(seeds: Seq[Int], iterations: Int = 5,
      damping: Double = 0.85): String = {
    val d = damping
    val s = seeds.size.toDouble
    val seedList = seeds.mkString(", ")
    val base =
      s"""WITH seq AS (
         |  SELECT page, LEAD(page) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS next
         |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
         |          user_id, ts, event_id FROM events)
         |  WHERE page IS NOT NULL),
         |edges AS (
         |  SELECT page AS src, next AS dst, COUNT(*) AS w
         |  FROM seq WHERE next IS NOT NULL
         |  GROUP BY 1, 2),
         |e AS (
         |  SELECT src, dst,
         |    CAST(w AS DOUBLE) / SUM(w) OVER (PARTITION BY src) AS share
         |  FROM edges),
         |nodes AS (
         |  SELECT src AS page FROM e UNION SELECT dst FROM e),
         |outn AS (SELECT DISTINCT src AS page FROM e),
         |r0 AS (
         |  SELECT page,
         |    CASE WHEN page IN ($seedList) THEN 1.0 / $s ELSE 0.0 END AS rank
         |  FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { i =>
      val p = s"r${i - 1}"
      s"""d$i AS (
         |  SELECT COALESCE(SUM(rank), 0.0) AS dm FROM $p
         |  WHERE page NOT IN (SELECT page FROM outn)),
         |c$i AS (
         |  SELECT e.dst AS page, SUM(e.share * r.rank) AS c
         |  FROM e JOIN $p r ON e.src = r.page GROUP BY 1),
         |r$i AS (
         |  SELECT nodes.page, ROUND(
         |    (CASE WHEN nodes.page IN ($seedList)
         |       THEN (1.0 - $d) / $s + $d * (SELECT dm FROM d$i) / $s
         |       ELSE 0.0 END) +
         |    $d * COALESCE(c$i.c, 0.0), 9) AS rank
         |  FROM nodes LEFT JOIN c$i ON nodes.page = c$i.page)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters
       |SELECT page, ROUND(rank, 6) AS rank FROM r$iterations
       |ORDER BY page""".stripMargin
  }

  /** Degree distribution of the simple undirected navigation graph,
    * with the continuous-approximation power-law MLE α̂ = 1 +
    * n / Σ ln(dᵢ / (d_min − ½)) (Clauset, Shalizi & Newman, SIAM Rev.
    * 2009, eq. 3.7 with d_min = 1) carried on every row — the
    * graph-health headline: web-like link graphs run α ≈ 2–3; α far
    * outside that band (or a histogram with no tail at all) says the
    * "link graph" is really a broadcast hub or a synthetic mesh, which
    * changes what PageRank/community weights mean downstream.
    *
    * Dataflow: edge extraction is the only corpus-scale stage; degrees
    * and their histogram are graph- then degree-cardinality. The MLE
    * reduces over the HISTOGRAM (Σ n_d·ln d), not per-node rows. */
  def degreeProfile(events: DataFrame): DataFrame = {
    val dir = navigationEdges(events)
    val u = dir.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      // NOTE: an r14o1 persist here regressed the close bench 0.67x —
      // reverted; both degree branches replay the edge extraction
    val degrees = u.select(col("a").as("page"))
      .union(u.select(col("b").as("page")))
      .groupBy("page").agg(count(lit(1)).as("degree"))
    val hist = degrees.groupBy("degree")
      .agg(count(lit(1)).as("n_nodes"))
    val wAll = Window.partitionBy(lit(1))
    hist
      .withColumn("frac",
        round(col("n_nodes") / sum("n_nodes").over(wAll), 6))
      .withColumn("alpha_mle",
        round(lit(1.0) + sum("n_nodes").over(wAll).cast("double") /
          sum(col("n_nodes") * log(col("degree") / lit(0.5))).over(wAll),
          6))
      .select("degree", "n_nodes", "frac", "alpha_mle")
      .orderBy("degree")
  }

  /** DuckDB oracle for [[degreeProfile]]. */
  val degreeOracleSql: String =
    """WITH seq AS (
      |  SELECT page, LEAD(page) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS next
      |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
      |          user_id, ts, event_id FROM events)
      |  WHERE page IS NOT NULL),
      |u AS (
      |  SELECT DISTINCT LEAST(page, next) AS a, GREATEST(page, next) AS b
      |  FROM seq WHERE next IS NOT NULL AND page <> next),
      |deg AS (
      |  SELECT page, COUNT(*) AS degree FROM (
      |    SELECT a AS page FROM u UNION ALL SELECT b FROM u)
      |  GROUP BY 1),
      |h AS (SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY 1)
      |SELECT degree, CAST(n_nodes AS BIGINT) AS n_nodes,
      |  ROUND(CAST(n_nodes AS DOUBLE) / SUM(n_nodes) OVER (), 6) AS frac,
      |  ROUND(1.0 + CAST(SUM(n_nodes) OVER () AS DOUBLE) /
      |    SUM(n_nodes * ln(degree / 0.5)) OVER (), 6) AS alpha_mle
      |FROM h ORDER BY degree""".stripMargin

  /** DuckDB oracle for [[navigationRank]]: the identical computation as
    * chained CTEs — one `r{i}` CTE per iteration, same 9-decimal
    * per-iteration round, same dangling redistribution. Generated here
    * so the iteration count can never drift between engine and
    * oracle. */
  def oracleSql(iterations: Int = 5, damping: Double = 0.85): String = {
    val d = damping
    val base =
      s"""WITH seq AS (
         |  SELECT page, LEAD(page) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS next
         |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
         |          user_id, ts, event_id FROM events)
         |  WHERE page IS NOT NULL),
         |edges AS (
         |  SELECT page AS src, next AS dst, COUNT(*) AS w
         |  FROM seq WHERE next IS NOT NULL
         |  GROUP BY 1, 2),
         |e AS (
         |  SELECT src, dst,
         |    CAST(w AS DOUBLE) / SUM(w) OVER (PARTITION BY src) AS share
         |  FROM edges),
         |nodes AS (
         |  SELECT src AS page FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         |outn AS (SELECT DISTINCT src AS page FROM e),
         |r0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { i =>
      val p = s"r${i - 1}"
      s"""d$i AS (
         |  SELECT COALESCE(SUM(rank), 0.0) AS dm FROM $p
         |  WHERE page NOT IN (SELECT page FROM outn)),
         |c$i AS (
         |  SELECT e.dst AS page, SUM(e.share * r.rank) AS c
         |  FROM e JOIN $p r ON e.src = r.page GROUP BY 1),
         |r$i AS (
         |  SELECT nodes.page, ROUND(
         |    (1.0 - $d) / (SELECT n FROM nn) +
         |    $d * (COALESCE(c$i.c, 0.0) +
         |          (SELECT dm FROM d$i) / (SELECT n FROM nn)), 9) AS rank
         |  FROM nodes LEFT JOIN c$i ON nodes.page = c$i.page)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters
       |SELECT page, ROUND(rank, 6) AS rank FROM r$iterations
       |ORDER BY page""".stripMargin
  }

  /** HITS hubs and authorities (Kleinberg, JACM 1999) over the
    * weighted navigation graph — the two-sided importance PageRank
    * collapses: a hub POINTS AT good pages, an authority IS one. On
    * a navigation graph: "router" pages users pass through vs
    * "destination" pages users travel to. Weighted mutual
    * reinforcement with L1 normalization per half-step (sum = 1,
    * SQL-friendly — the spectral norm only changes scale), fixed
    * iteration count, per-step 9-rounding so cross-engine drift
    * can't compound (the [[pagerank]] discipline).
    *
    * Scale shape per iteration: two edge-table equi-joins grouped on
    * the opposite endpoint + a 1-row normalizer factor — the same
    * Pregel dataflow as [[pagerank]]; edges partition once and only
    * the score tables move. Lineage is truncated by ONE eager
    * checkpoint barrier per iteration carrying (hub, auth) in a
    * single frame — a per-half-step barrier doubles the job count
    * for no correctness gain (measured ~2x on the q360 fixture); the
    * mid-iteration auth table is persisted (not checkpointed) so its
    * two consumers — the hub half-step and the iteration-end join —
    * share one computation inside the barrier job. */
  def hits(spark: SparkSession, edges: DataFrame,
      iterations: Int = 6): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"),
        col("w").cast("double").as("w"))
    // partition the edge table ONCE per join direction and cache the
    // partitioned layout: each iteration's src-side and dst-side
    // equi-joins then reuse the cached hash partitioning (the
    // exchange planner sees it through InMemoryTableScan) and only
    // the node-sized score tables shuffle per step — the edge corpus
    // never moves again, which is the property that survives a
    // 100 TB edge list
    val e = e0.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eByDst = e0.repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("page"))
      .union(e.select(col("dst").as("page")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble

    var scores = nodes.withColumn("hub", lit(1.0 / n))
      .withColumn("auth", lit(1.0 / n))
      .truncateLineage()

    for (_ <- 1 to iterations) {
      // persist the node-sized message tables: each has TWO
      // consumers (its broadcast normalizer subplan and the main
      // left join), and an unpersisted broadcast subtree re-runs
      // the edge join+agg — 4 edge joins per iteration instead of 2
      val aRaw = e.join(
          scores.select(col("page").as("__hp"), col("hub")),
          e("src") === col("__hp"))
        .groupBy(col("dst").as("page"))
        .agg(sum(col("w") * col("hub")).as("__a"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val aNorm = aRaw.agg(sum("__a").as("__sa"))
      val auth = nodes.join(aRaw, Seq("page"), "left_outer")
        .crossJoin(broadcast(aNorm))   // 1-row normalizer factor
        .select(col("page"),
          round(coalesce(col("__a"), lit(0.0)) / col("__sa"), 9)
            .as("auth"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hRaw = eByDst.join(
          auth.select(col("page").as("__ap"), col("auth")),
          eByDst("dst") === col("__ap"))
        .groupBy(col("src").as("page"))
        .agg(sum(col("w") * col("auth")).as("__h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hNorm = hRaw.agg(sum("__h").as("__sh"))
      val hub = nodes.join(hRaw, Seq("page"), "left_outer")
        .crossJoin(broadcast(hNorm))   // 1-row normalizer factor
        .select(col("page"),
          round(coalesce(col("__h"), lit(0.0)) / col("__sh"), 9)
            .as("hub"))
      scores = hub.join(auth, Seq("page"))
        .select("page", "hub", "auth")
        .truncateLineage()   // the ONE barrier per iteration
      aRaw.unpersist(); hRaw.unpersist(); auth.unpersist()
    }

    val out = scores
      .select(col("page").cast("bigint").as("page"),
        round(col("hub"), 6).as("hub"),
        round(col("auth"), 6).as("auth"))
      .orderBy("page")
    e.unpersist(); eByDst.unpersist(); nodes.unpersist()
    out
  }

  /** The registered query: navigation HITS over `events`. */
  def navigationHits(spark: SparkSession, events: DataFrame,
      iterations: Int = 6): DataFrame =
    hits(spark, navigationEdges(events), iterations)

  /** DuckDB oracle for [[navigationHits]]: the [[oracleSql]] edge
    * CTEs with the mutual-reinforcement steps unrolled per
    * iteration, 9-rounded per step like the engine. */
  def hitsOracleSql(iterations: Int = 6): String = {
    // e/nodes are MATERIALIZED: the unrolled iterations reference
    // them ~5x each, and every inlined reference re-opens the
    // parquet view — enough to hit the process fd limit
    val base =
      s"""WITH seq AS MATERIALIZED (
         |  SELECT page, LEAD(page) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS next
         |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
         |          user_id, ts, event_id FROM events)
         |  WHERE page IS NOT NULL),
         |e AS MATERIALIZED (
         |  SELECT page AS src, next AS dst,
         |    CAST(COUNT(*) AS DOUBLE) AS w
         |  FROM seq WHERE next IS NOT NULL
         |  GROUP BY 1, 2),
         |nodes AS MATERIALIZED (
         |  SELECT src AS page FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         |h0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS hub
         |  FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { i =>
      val ph = s"h${i - 1}"
      s"""ar$i AS MATERIALIZED (
         |  SELECT e.dst AS page, SUM(e.w * h.hub) AS a
         |  FROM e JOIN $ph h ON e.src = h.page GROUP BY 1),
         |a$i AS MATERIALIZED (
         |  SELECT nodes.page, ROUND(
         |    COALESCE(ar$i.a, 0.0) / (SELECT SUM(a) FROM ar$i), 9)
         |    AS auth
         |  FROM nodes LEFT JOIN ar$i ON nodes.page = ar$i.page),
         |hr$i AS MATERIALIZED (
         |  SELECT e.src AS page, SUM(e.w * a.auth) AS h
         |  FROM e JOIN a$i a ON e.dst = a.page GROUP BY 1),
         |h$i AS MATERIALIZED (
         |  SELECT nodes.page, ROUND(
         |    COALESCE(hr$i.h, 0.0) / (SELECT SUM(h) FROM hr$i), 9)
         |    AS hub
         |  FROM nodes LEFT JOIN hr$i ON nodes.page = hr$i.page)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters
       |SELECT h.page, ROUND(h.hub, 6) AS hub,
       |  ROUND(a.auth, 6) AS auth
       |FROM h$iterations h JOIN a$iterations a ON h.page = a.page
       |ORDER BY h.page""".stripMargin
  }
}
