package graft.operators

import graft.util.Checkpoints.TruncateOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph structure audits over the weighted navigation graph —
  * the three numbers that say whether the graph-tier outputs (q150
  * PageRank, q360 HITS, q203 triangles, q278 k-core) describe one
  * coherent web or disconnected islands:
  *
  *  - Newman modularity of a node partition (Newman & Girvan, Phys.
  *    Rev. E 2004): Q = Σ_c [e_c/m − (d_c/2m)²] on the symmetrized
  *    weighted graph — "do users navigate within page sections or
  *    across them".
  *  - degree assortativity (Newman, Phys. Rev. Lett. 2002): the
  *    Pearson correlation of endpoint degrees over edges — hub-to-hub
  *    wiring (r > 0) vs hub-to-leaf (r < 0, the usual web shape).
  *  - reciprocity: the share of directed edge weight whose reverse
  *    edge also exists — back-and-forth navigation vs one-way funnels.
  *
  * All three are edge-table aggregates (one shuffle on the edge key,
  * degree tables at node cardinality, 1-row outputs) — no iteration,
  * no pair explosion. */
object GraphAudit {

  /** One row `(n_nodes, n_communities, m_weight, within_share,
    * modularity)` for the navigation graph under the page-section
    * partition `page / sectionSize` (integer division). Modularity
    * uses the standard symmetrized convention: each directed edge
    * contributes its weight to both endpoints' degrees, self-loops
    * count once. */
  def modularity(events: DataFrame,
      sectionSize: Int = 10): DataFrame = {
    require(sectionSize >= 1, "sectionSize must be >= 1")
    val e = GraphRank.navigationEdges(events)
      .select(col("src"), col("dst"), col("w").cast("double").as("w"))
      // four consumers (total weight, both degree branches, the
      // within-community agg) — persist the graph-sized edge table so
      // the corpus-scale edge extraction runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = e.agg(sum("w").as("__m"),
      countDistinct(col("src")).as("__ns"))
    // weighted degree per node on the symmetrized graph: out + in
    val deg = e.select(col("src").as("page"), col("w"))
      .unionByName(e.select(col("dst").as("page"), col("w")))
      .groupBy("page").agg(sum("w").as("d"))
    val nNodes = deg.count()
    // per-community within-weight and degree mass
    val sec = (c: org.apache.spark.sql.Column) =>
      floor(c / sectionSize).cast("long")
    val within = e
      .groupBy(sec(col("src")).as("cs"), sec(col("dst")).as("cd"))
      .agg(sum("w").as("ww"))
    val eIn = within.filter(col("cs") === col("cd"))
      .select(col("cs").as("c"), col("ww"))
      .groupBy("c").agg(sum("ww").as("e_c"))
    val dC = deg.groupBy(sec(col("page")).as("c"))
      .agg(sum("d").as("d_c"))
    val terms = dC.join(eIn, Seq("c"), "left_outer")
      .crossJoin(broadcast(m))   // 1-row total-weight factor
      .select(
        (coalesce(col("e_c"), lit(0.0)) / col("__m")).as("__in"),
        pow(col("d_c") / (col("__m") * 2.0), 2).as("__sq"))
    val s = terms.agg(count(lit(1)).as("k"),
      sum("__in").as("__within"), sum("__sq").as("__sqs"))
    s.crossJoin(broadcast(m))   // 1-row stat factor
      .select(
        lit(nNodes).as("n_nodes"),
        col("k").cast("bigint").as("n_communities"),
        round(col("__m"), 6).as("m_weight"),
        round(col("__within"), 6).as("within_share"),
        round(col("__within") - col("__sqs"), 6).as("modularity"))
  }

  /** DuckDB oracle for [[modularity]] (sectionSize = 10). */
  val modularityOracleSql: String =
    """WITH seq AS MATERIALIZED (
      |  SELECT page, LEAD(page) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS next
      |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
      |          user_id, ts, event_id FROM events)
      |  WHERE page IS NOT NULL),
      |e AS MATERIALIZED (
      |  SELECT page AS src, next AS dst,
      |    CAST(COUNT(*) AS DOUBLE) AS w
      |  FROM seq WHERE next IS NOT NULL GROUP BY 1, 2),
      |m AS (SELECT SUM(w) AS m FROM e),
      |deg AS (
      |  SELECT page, SUM(w) AS d FROM (
      |    SELECT src AS page, w FROM e
      |    UNION ALL SELECT dst, w FROM e)
      |  GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM deg),
      |ein AS (
      |  SELECT src // 10 AS c, SUM(w) AS e_c
      |  FROM e WHERE src // 10 = dst // 10 GROUP BY 1),
      |dc AS (
      |  SELECT page // 10 AS c, SUM(d) AS d_c FROM deg GROUP BY 1),
      |terms AS (
      |  SELECT COALESCE(ein.e_c, 0.0) / m.m AS i,
      |    POW(dc.d_c / (m.m * 2.0), 2) AS sq
      |  FROM dc LEFT JOIN ein ON dc.c = ein.c CROSS JOIN m)
      |SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_nodes,
      |  CAST(COUNT(*) AS BIGINT) AS n_communities,
      |  ROUND((SELECT m FROM m), 6) AS m_weight,
      |  ROUND(SUM(i), 6) AS within_share,
      |  ROUND(SUM(i) - SUM(sq), 6) AS modularity
      |FROM terms""".stripMargin

  /** One row `(n_edges, r_assortativity, mean_src_deg, mean_dst_deg)`
    * — the weighted-edge-count Pearson correlation between the
    * symmetrized degrees of the two endpoints, each directed edge
    * counted with multiplicity w (the standard weighted convention).
    * NULL r when either endpoint's degree is constant. */
  def assortativity(events: DataFrame): DataFrame = {
    val e = GraphRank.navigationEdges(events)
      .select(col("src"), col("dst"), col("w").cast("double").as("w"))
      // NOTE: an r14o1 persist here regressed the close bench 0.61x —
      // reverted; the three branches replay the edge extraction
    val deg = e.select(col("src").as("page"), col("w"))
      .unionByName(e.select(col("dst").as("page"), col("w")))
      .groupBy("page").agg(sum("w").as("d"))
    val withDeg = e
      .join(deg.select(col("page").as("src"), col("d").as("ds")),
        Seq("src"))
      .join(deg.select(col("page").as("dst"), col("d").as("dd")),
        Seq("dst"))
    val g = withDeg.agg(
      count(lit(1)).as("n_edges"),
      sum("w").as("__sw"),
      sum(col("w") * col("ds")).as("__sx"),
      sum(col("w") * col("dd")).as("__sy"),
      sum(col("w") * col("ds") * col("ds")).as("__sxx"),
      sum(col("w") * col("dd") * col("dd")).as("__syy"),
      sum(col("w") * col("ds") * col("dd")).as("__sxy"))
    val sw = col("__sw")
    val covxy = col("__sxy") / sw - (col("__sx") / sw) *
      (col("__sy") / sw)
    val vx = col("__sxx") / sw - (col("__sx") / sw) *
      (col("__sx") / sw)
    val vy = col("__syy") / sw - (col("__sy") / sw) *
      (col("__sy") / sw)
    g.select(
      col("n_edges"),
      round(when(vx > 0.0 && vy > 0.0,
        covxy / sqrt(vx * vy)), 6).as("r_assortativity"),
      round(col("__sx") / sw, 6).as("mean_src_deg"),
      round(col("__sy") / sw, 6).as("mean_dst_deg"))
  }

  /** DuckDB oracle for [[assortativity]]. */
  val assortativityOracleSql: String =
    """WITH seq AS MATERIALIZED (
      |  SELECT page, LEAD(page) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS next
      |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
      |          user_id, ts, event_id FROM events)
      |  WHERE page IS NOT NULL),
      |e AS MATERIALIZED (
      |  SELECT page AS src, next AS dst,
      |    CAST(COUNT(*) AS DOUBLE) AS w
      |  FROM seq WHERE next IS NOT NULL GROUP BY 1, 2),
      |deg AS MATERIALIZED (
      |  SELECT page, SUM(w) AS d FROM (
      |    SELECT src AS page, w FROM e
      |    UNION ALL SELECT dst, w FROM e)
      |  GROUP BY 1),
      |wd AS (
      |  SELECT e.w, s.d AS ds, t.d AS dd
      |  FROM e JOIN deg s ON e.src = s.page
      |  JOIN deg t ON e.dst = t.page),
      |g AS (
      |  SELECT COUNT(*) AS n_edges, SUM(w) AS sw,
      |    SUM(w * ds) AS sx, SUM(w * dd) AS sy,
      |    SUM(w * ds * ds) AS sxx, SUM(w * dd * dd) AS syy,
      |    SUM(w * ds * dd) AS sxy
      |  FROM wd),
      |f AS (
      |  SELECT *,
      |    sxy / sw - (sx / sw) * (sy / sw) AS covxy,
      |    sxx / sw - (sx / sw) * (sx / sw) AS vx,
      |    syy / sw - (sy / sw) * (sy / sw) AS vy
      |  FROM g)
      |SELECT CAST(n_edges AS BIGINT) AS n_edges,
      |  ROUND(CASE WHEN vx > 0 AND vy > 0
      |    THEN covxy / SQRT(vx * vy) END, 6) AS r_assortativity,
      |  ROUND(sx / sw, 6) AS mean_src_deg,
      |  ROUND(sy / sw, 6) AS mean_dst_deg
      |FROM f""".stripMargin

  /** One row `(n_edges, n_reciprocated, w_total, w_reciprocated,
    * edge_reciprocity, weight_reciprocity)`: an edge (u→v, u ≠ v) is
    * reciprocated when v→u also exists. Self-loops are excluded (a
    * self-loop is trivially its own reverse). */
  def reciprocity(events: DataFrame): DataFrame = {
    val e = GraphRank.navigationEdges(events)
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("w").cast("double").as("w"))
      // probe + reversed sides both read this — one edge extraction
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rev = e.select(col("dst").as("src"), col("src").as("dst"),
      lit(true).as("__has_rev"))
    val marked = e.join(rev.dropDuplicates("src", "dst"),
      Seq("src", "dst"), "left_outer")
    val g = marked.agg(
      count(lit(1)).as("n_edges"),
      sum(when(col("__has_rev"), 1L).otherwise(0L))
        .as("n_reciprocated"),
      sum("w").as("__wt"),
      sum(when(col("__has_rev"), col("w")).otherwise(0.0))
        .as("__wr"))
    g.select(
      col("n_edges"), col("n_reciprocated"),
      round(col("__wt"), 6).as("w_total"),
      round(col("__wr"), 6).as("w_reciprocated"),
      round(col("n_reciprocated").cast("double") / col("n_edges"), 6)
        .as("edge_reciprocity"),
      round(col("__wr") / col("__wt"), 6).as("weight_reciprocity"))
  }

  /** DuckDB oracle for [[reciprocity]]. */
  val reciprocityOracleSql: String =
    """WITH seq AS MATERIALIZED (
      |  SELECT page, LEAD(page) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS next
      |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
      |          user_id, ts, event_id FROM events)
      |  WHERE page IS NOT NULL),
      |e AS MATERIALIZED (
      |  SELECT page AS src, next AS dst,
      |    CAST(COUNT(*) AS DOUBLE) AS w
      |  FROM seq WHERE next IS NOT NULL AND page <> next
      |  GROUP BY 1, 2),
      |marked AS (
      |  SELECT e.w, r.src IS NOT NULL AS has_rev
      |  FROM e LEFT JOIN e r ON e.src = r.dst AND e.dst = r.src)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
      |  CAST(SUM(CASE WHEN has_rev THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_reciprocated,
      |  ROUND(SUM(w), 6) AS w_total,
      |  ROUND(SUM(CASE WHEN has_rev THEN w ELSE 0 END), 6)
      |    AS w_reciprocated,
      |  ROUND(CAST(SUM(CASE WHEN has_rev THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*), 6) AS edge_reciprocity,
      |  ROUND(SUM(CASE WHEN has_rev THEN w ELSE 0 END) / SUM(w), 6)
      |    AS weight_reciprocity
      |FROM marked""".stripMargin

  /** Exact all-pairs BFS distances over the simple undirected
    * navigation graph, summarized per node: `(page, n_reach, ecc,
    * sum_dist, avg_dist)` — eccentricity (max distance), reach count
    * (including self at d = 0), and mean distance to the reachable
    * others. MAX(ecc) across rows is the graph diameter; the numbers
    * say whether the page web the graph tier ranks (q150/q360) is one
    * tight ball or a chain of corridors.
    *
    * Distances are computed to `maxHops` — EXACT BFS whenever the
    * true diameter is below the cap (both engines share the cap, so
    * the comparison is well-defined either way; pairs beyond the cap
    * are excluded in both).
    *
    * Scale shape: the page vocabulary is BOUNDED (the props.k id
    * space), so the dist table is at most pages² — never
    * corpus-sized. The expansion is FRONTIER BFS: each hop joins only
    * the pairs DISCOVERED LAST HOP against the (once-partitioned)
    * edge table and anti-joins the accumulated set, so a hop's cost
    * is frontier-sized, not pairs²-sized — the old form joined the
    * full accumulated table every hop, paying pairs²·degree long
    * after the graph was saturated (the driver graph saturates at
    * hop 1). An empty frontier exits early: BFS is monotone, so no
    * later hop can discover a pair (both engines still agree — the
    * oracle's recursive UNION fixpoints the same way). Each frontier
    * is EAGERLY localCheckpointed to truncate iterative lineage (the
    * q150 PageRank discipline); the accumulated set stays a shallow
    * union of checkpointed levels and is never re-materialized. The
    * corpus is touched exactly once, by the edge extraction. */
  def bfsDistances(events: DataFrame, maxHops: Int = 6): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = GraphRank.navigationEdges(events)
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val sym = e.unionByName(
      e.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a"))   // partition ONCE; every hop's join reuses it
      .truncateLineage()   // graph-sized, reused every hop
    val nodes = sym.select(col("a").as("node")).distinct()
    var dist = nodes
      .select(col("node").as("src"), col("node"), lit(0).as("d"))
      .truncateLineage()
    var frontier = dist
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      hop += 1
      val cand = frontier.join(sym, frontier("node") === sym("a"))
        .select(frontier("src"), sym("b").as("node"),
          (frontier("d") + 1).as("d"))
        .dropDuplicates("src", "node")   // many paths, one pair per hop
      val fresh = cand.join(dist, Seq("src", "node"), "left_anti")
        .truncateLineage()   // truncate iterative lineage
      if (fresh.isEmpty) done = true
      else {
        dist = dist.unionByName(fresh)   // shallow union of checkpointed levels
        frontier = fresh
      }
    }
    dist.groupBy("src").agg(
        count(lit(1)).as("n_reach"),
        max("d").cast("bigint").as("ecc"),
        sum("d").cast("bigint").as("sum_dist"))
      .select(
        col("src").cast("bigint").as("page"),
        col("n_reach"),
        col("ecc"),
        col("sum_dist"),
        round(when(col("n_reach") > 1,
          col("sum_dist").cast("double") /
            (col("n_reach") - 1).cast("double")), 6).as("avg_dist"))
      .orderBy("page")
  }

  /** DuckDB oracle for [[bfsDistances]] (maxHops = 6): the same
    * capped-depth recursive enumeration reduced by MIN(d) — the
    * UNION-distinct working set stays ≤ pages² per level. */
  val bfsDistancesOracleSql: String =
    """WITH RECURSIVE seq AS MATERIALIZED (
      |  SELECT page, LEAD(page) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS next
      |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
      |          user_id, ts, event_id FROM events)
      |  WHERE page IS NOT NULL),
      |u AS (
      |  SELECT DISTINCT LEAST(page, next) AS a, GREATEST(page, next) AS b
      |  FROM seq WHERE next IS NOT NULL AND page <> next),
      |sym AS MATERIALIZED (
      |  SELECT a, b FROM u UNION ALL SELECT b, a FROM u),
      |nodes AS (SELECT DISTINCT a AS node FROM sym),
      |r AS (
      |  SELECT node AS src, node, 0 AS d FROM nodes
      |  UNION
      |  SELECT r.src, sym.b AS node, r.d + 1 AS d
      |  FROM r JOIN sym ON r.node = sym.a WHERE r.d < 6),
      |m AS (SELECT src, node, MIN(d) AS d FROM r GROUP BY 1, 2)
      |SELECT CAST(src AS BIGINT) AS page,
      |  CAST(COUNT(*) AS BIGINT) AS n_reach,
      |  CAST(MAX(d) AS BIGINT) AS ecc,
      |  CAST(SUM(d) AS BIGINT) AS sum_dist,
      |  ROUND(CASE WHEN COUNT(*) > 1
      |    THEN CAST(SUM(d) AS DOUBLE) / (COUNT(*) - 1) END, 6)
      |    AS avg_dist
      |FROM m GROUP BY src ORDER BY page""".stripMargin
}
