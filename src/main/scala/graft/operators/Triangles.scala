package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed triangle counting and local clustering coefficients
  * over the clickstream navigation graph — the graph-shape statistics
  * (beside q150's PageRank and q170's communities) that distinguish a
  * genuinely linked page network from a star around a hub: clustering
  * coefficient is the standard "how web-like is this link graph"
  * measure (Watts & Strogatz '98), and triangle counts feed spam/bot
  * detection (bot navigation paths form chains, not triangles).
  *
  * Scale shape — the naive 3-way self-join on an undirected edge list
  * enumerates every WEDGE at every node: a single hub of degree d
  * contributes d² join rows, which on a power-law click graph is the
  * whole runtime. The compact-forward / degree-ordering fix (Schank &
  * Wagner '05; Suri & Vassilvitskii, WWW '11 in its MapReduce form)
  * orients each undirected edge from its lower-(degree, id) endpoint
  * to its higher one. The orientation is acyclic, every triangle
  * survives as exactly ONE oriented path a→b, a→c with b→c, and each
  * node's out-degree is bounded by O(√|E|) — the wedge join touches
  * hub nodes only through their few out-edges, so the shuffle is
  * arboricity-bounded instead of hub-quadratic. Both joins are plain
  * equi-joins on node keys: Catalyst shuffles each side once and AQE
  * handles any residual skew.
  */
object Triangles {

  /** Canonical undirected edge set `(a, b)` with a < b, self-loops
    * dropped, from a directed weighted edge list. */
  private def undirected(edges: DataFrame): DataFrame =
    edges
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** Per-node report `(page, degree, triangles, coeff)` over the
    * navigation graph: degree in the simple undirected graph, number
    * of triangles through the node, and the local clustering
    * coefficient 2T/(d(d−1)) (0 by convention when d < 2). */
  def navigationTriangles(events: DataFrame): DataFrame =
    triangleStats(GraphRank.navigationEdges(events))

  /** The same report over any directed `(src, dst, …)` edge list —
    * direction, multiplicity and self-loops are collapsed to the
    * simple undirected graph first. */
  def triangleStats(edges: DataFrame): DataFrame = {
    // u feeds degrees AND the orientation; degrees feeds the
    // orientation (twice) AND the final report; oriented feeds both
    // wedge sides AND the closing join. Persist the graph-sized
    // frames once instead of re-expanding the corpus-scale edge
    // extraction under every reference (plan would otherwise carry
    // 40+ shuffles of repeated subtrees; the cache is |E|-sized —
    // graph-scale, not event-scale). Callers (Verify/Bench/PlanAudit)
    // clearCache() between queries.
    val u = undirected(edges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val degrees = u.select(col("a").as("page"))
      .union(u.select(col("b").as("page")))
      .groupBy("page").agg(count(lit(1)).as("degree"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // total order (degree, id); orient each edge low → high
    val withDeg = u
      .join(degrees.withColumnRenamed("page", "a")
        .withColumnRenamed("degree", "da"), "a")
      .join(degrees.withColumnRenamed("page", "b")
        .withColumnRenamed("degree", "db"), "b")
    val aFirst = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("lo"),
      when(aFirst, col("b")).otherwise(col("a")).as("hi"),
      when(aFirst, col("da")).otherwise(col("db")).as("dlo"),
      when(aFirst, col("db")).otherwise(col("da")).as("dhi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // wedges at the lowest corner: pairs of out-neighbors in order
    val e1 = oriented.select(col("lo").as("x"), col("hi").as("y"),
      col("dhi").as("dy"))
    val e2 = oriented.select(col("lo").as("x"), col("hi").as("z"),
      col("dhi").as("dz"))
    val wedges = e1.join(e2, "x")
      .where((col("dy") < col("dz")) ||
        (col("dy") === col("dz") && col("y") < col("z")))
    // triangle iff the closing oriented edge y→z exists
    val tris = wedges.join(
      oriented.select(col("lo").as("y"), col("hi").as("z")),
      Seq("y", "z"))
      .select(col("x").as("c1"), col("y").as("c2"), col("z").as("c3"))

    val perNode = tris
      .select(explode(array(col("c1"), col("c2"), col("c3"))).as("page"))
      .groupBy("page").agg(count(lit(1)).as("triangles"))

    degrees
      .join(perNode, Seq("page"), "left_outer")
      .select(
        col("page"),
        col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(when(col("degree") < 2, 0.0)
          .otherwise(coalesce(col("triangles"), lit(0L)).cast("double")
            * 2.0 / (col("degree") * (col("degree") - 1L)).cast("double")),
          6).as("coeff"))
      .orderBy("page")
  }

  /** DuckDB oracle for [[navigationTriangles]] — identical edge
    * extraction to [[GraphRank.oracleSql]], then the same
    * degree-ordered orientation and two joins. */
  val oracleSql: String =
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
      |o AS (
      |  SELECT CASE WHEN (da.degree, u.a) < (db.degree, u.b)
      |           THEN u.a ELSE u.b END AS lo,
      |         CASE WHEN (da.degree, u.a) < (db.degree, u.b)
      |           THEN u.b ELSE u.a END AS hi,
      |         CASE WHEN (da.degree, u.a) < (db.degree, u.b)
      |           THEN db.degree ELSE da.degree END AS dhi
      |  FROM u
      |  JOIN deg da ON da.page = u.a
      |  JOIN deg db ON db.page = u.b),
      |tri AS (
      |  SELECT e1.lo AS c1, e1.hi AS c2, e2.hi AS c3
      |  FROM o e1
      |  JOIN o e2 ON e1.lo = e2.lo
      |    AND (e1.dhi, e1.hi) < (e2.dhi, e2.hi)
      |  JOIN o e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
      |corners AS (
      |  SELECT c1 AS page FROM tri
      |  UNION ALL SELECT c2 FROM tri
      |  UNION ALL SELECT c3 FROM tri),
      |pn AS (SELECT page, COUNT(*) AS triangles FROM corners GROUP BY 1)
      |SELECT deg.page, deg.degree,
      |  COALESCE(pn.triangles, 0) AS triangles,
      |  ROUND(CASE WHEN deg.degree < 2 THEN 0.0
      |    ELSE CAST(COALESCE(pn.triangles, 0) AS DOUBLE) * 2.0 /
      |         (deg.degree * (deg.degree - 1)) END, 6) AS coeff
      |FROM deg LEFT JOIN pn ON deg.page = pn.page
      |ORDER BY deg.page""".stripMargin
}
