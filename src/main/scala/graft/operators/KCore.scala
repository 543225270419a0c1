package graft.operators

import graft.util.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition of the navigation graph — the iterative-peel
  * cohesion measure (Seidman, "Network structure and minimum degree",
  * Social Networks 1983) that completes the graph-shape suite
  * (q150 PageRank = importance, q203 triangles = local clustering,
  * q223 degree profile = raw connectivity): the k-core is the maximal
  * subgraph where EVERY node keeps ≥ k neighbors after all weaker
  * nodes are removed. Cores expose the cohesive nucleus a degree
  * histogram hides — a star hub has huge degree but falls out of the
  * 2-core the moment its leaves peel; bot farms and boilerplate
  * navigation chains never reach deep cores.
  *
  * Scale shape: the classic peel is strictly sequential (remove ONE
  * min-degree node at a time); the distributed form peels in ROUNDS —
  * drop every node of degree < k, recompute degrees, repeat to
  * fixpoint. Each round is one grouped degree agg + two semi-joins,
  * all graph-cardinality (the corpus-scale work happened once, in the
  * edge extraction), and the round count is bounded by the
  * degeneracy ordering depth, small for real graphs. Each round
  * TRUNCATES LINEAGE with an eager `localCheckpoint` (the PageRank
  * lesson: a frame referenced twice per round doubles the logical
  * plan per iteration and Catalyst re-analysis dominates the runtime
  * long before the data does).
  */
object KCore {

  /** Nodes of the k-core of the simple undirected graph under the
    * directed edge list `(src, dst, …)`: `(page, core_degree)` —
    * the node's degree WITHIN the final core — ordered by page.
    * `maxRounds` is a safety valve; the fixpoint always lands first
    * on finite graphs. If the valve DOES trip (possible only if
    * maxRounds is set below the graph's peel depth), the result is a
    * superset of the true k-core — that truncation is logged loudly
    * rather than silently returned as converged. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var cur = edges
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .truncateLineage()
    var edgeCount = cur.count()
    var round = 0
    var converged = edgeCount == 0L
    while (!converged && round < maxRounds) {
      val deg = cur.select(col("a").as("page"))
        .union(cur.select(col("b").as("page")))
        .groupBy("page").agg(count(lit(1)).as("degree"))
      val keep = deg.where(col("degree") >= k).select("page")
      val next = cur
        .join(keep.withColumnRenamed("page", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("page", "b"), Seq("b"), "left_semi")
        .truncateLineage()
      val nextCount = next.count()
      converged = nextCount == edgeCount
      cur = next
      edgeCount = nextCount
      round += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"kCore: maxRounds=$maxRounds reached WITHOUT convergence — " +
          s"returning a partially-peeled superset of the true $k-core " +
          s"($edgeCount edges remain); raise maxRounds")
    // an emptied graph falls through: the agg of an empty edge list
    // is an empty (page, core_degree) frame with the right schema
    cur.select(col("a").as("page"))
      .union(cur.select(col("b").as("page")))
      .groupBy("page").agg(count(lit(1)).as("core_degree"))
      .orderBy("page")
  }

  /** k-core of the clickstream page graph. */
  def navigationKCore(events: DataFrame, k: Int): DataFrame =
    kCore(GraphRank.navigationEdges(events), k)

  /** DuckDB oracle for [[navigationKCore]]: the round-wise peel
    * UNROLLED to `rounds` static CTE pairs (degrees → surviving
    * edges). Peeling is monotone — once the fixpoint lands, further
    * rounds are identity — so any `rounds` ≥ the graph's peel depth
    * replays the engine's fixpoint exactly (parity runs at both SFs
    * are the witness; depth is single digits on these graphs, 24 is
    * a wide margin). Avoids recursive-CTE aggregation limits
    * entirely. */
  def navigationKCoreOracleSql(k: Int = 3, rounds: Int = 24): String = {
    val base =
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |  FROM (
        |    SELECT page AS src,
        |      LEAD(page) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS dst
        |    FROM (SELECT user_id, ts, event_id,
        |        CAST(props->>'k' AS INTEGER) AS page FROM events)
        |    WHERE page IS NOT NULL)
        |  WHERE dst IS NOT NULL AND src <> dst)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""n$r AS MATERIALIZED (
         |  SELECT page FROM (
         |    SELECT a AS page FROM e${r - 1}
         |    UNION ALL SELECT b FROM e${r - 1})
         |  GROUP BY 1 HAVING COUNT(*) >= $k),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN n$r x ON e.a = x.page
         |  JOIN n$r y ON e.b = y.page)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$steps
       |SELECT page, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
       |  SELECT a AS page FROM e$rounds
       |  UNION ALL SELECT b FROM e$rounds)
       |GROUP BY 1 ORDER BY page""".stripMargin
  }
}
