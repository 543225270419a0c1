package graft.operators

import graft.util.Checkpoints.TruncateOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Community detection over the clickstream navigation graph via
  * synchronous weighted label propagation (Raghavan, Albert & Kumara,
  * Phys. Rev. E 76, 2007) — the graph-side counterpart to
  * [[GraphRank]]: where PageRank scores page AUTHORITY, label
  * propagation finds page NEIGHBORHOODS (topic clusters / user-flow
  * modules), the grouping a corpus-curation pipeline uses to
  * stratify sampling so one giant navigation cluster can't dominate
  * a training mix. Reference analog: the same web_events domain the
  * navigation graph is built from (`stg_web_events.sql`,
  * `samples/web_events.json:1-4`).
  *
  * Determinism contract (this is what makes the operator oracle-able
  * where classic LPA is not): SYNCHRONOUS updates, integer edge
  * weights, and the tie rule "highest total neighbor weight wins,
  * ties broken by SMALLEST label". No randomness, no update-order
  * dependence — the fixed-iteration result is a pure function of the
  * edge multiset, reproducible CTE-for-CTE in any SQL engine.
  * Known (accepted) property of the synchronous schedule: labels can
  * 2-cycle on bipartite substructures (Raghavan '07 §III); the fixed
  * iteration count keeps even that deterministic, and real
  * navigation graphs are loop-heavy, not bipartite.
  *
  * Scale shape (100 TB events):
  *   - Edge extraction is [[GraphRank.navigationEdges]]'s one
  *     user-key shuffle; symmetrization doubles the edge table then
  *     re-aggregates — still graph-sized, not event-sized.
  *   - Each iteration is `edges ⋈ labels` on `src` (edges
  *     repartitioned once and persisted, Pregel-style: only the
  *     |nodes|-row label table moves per iteration), a (dst, label)
  *     partial-aggregated vote count, and a per-node window top-1
  *     whose partitions are node-sized (bounded by degree, never by
  *     graph size).
  *   - Plans are cut per iteration (persist + count) so Catalyst
  *     re-analyzes O(1) depth, not an unrolled k-join tree.
  */
object Communities {

  /** Undirected view of a weighted directed edge list: both
    * directions emitted, parallel edges merged by weight-sum,
    * self-loops dropped (a self-vote would freeze every node at its
    * own label and no communities could form). */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"), col("w"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(sum("w").as("w"))

  /** Fixed-iteration synchronous weighted LPA. Input: directed
    * weighted edges `(src, dst, w)`; output: `(page, community,
    * csize)` ordered by page, where `community` is the surviving
    * label (a member page id) and `csize` its final population. */
  def labelPropagation(spark: SparkSession, edges: DataFrame,
      iterations: Int = 4): DataFrame = {
    val e = undirected(edges)
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nodes = e.select(col("src").as("page")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // eager localCheckpoint per iteration: truncates lineage so
    // Catalyst never re-analyzes the unrolled k-iteration tree (the
    // GraphRank fix — see its scaladoc for the measured cost)
    var labels = nodes.withColumn("label", col("page"))
      .truncateLineage()

    for (_ <- 1 to iterations) {
      val votes = e.join(labels, e("src") === labels("page"))
        .groupBy(e("dst").as("vpage"), col("label"))
        .agg(sum("w").as("wt"))
      val top = Window.partitionBy(col("vpage"))
        .orderBy(col("wt").desc, col("label").asc)
      // Undirected edges ⇒ every node in `nodes` has ≥1 neighbor, so
      // the vote table covers all nodes and no keep-old fallback is
      // needed; assert that invariant instead of silently joining.
      labels = votes
        .withColumn("__rn", row_number().over(top))
        .where(col("__rn") === 1)
        .select(col("vpage").as("page"), col("label"))
        .truncateLineage()
    }

    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("csize"))
    val out = labels.join(sizes, "label")
      .select(col("page"), col("label").as("community"),
        col("csize"))
      .orderBy(col("page"))
    e.unpersist(); nodes.unpersist()
    out
  }

  /** The registered query: communities of the navigation graph. */
  def navigationCommunities(spark: SparkSession, events: DataFrame,
      iterations: Int = 4): DataFrame =
    labelPropagation(spark, GraphRank.navigationEdges(events), iterations)

  /** DuckDB oracle for [[navigationCommunities]] — the identical
    * computation as chained CTEs, one `l{i}` per iteration, same
    * (weight desc, label asc) tie rule. Generated so the iteration
    * count can never drift between engine and oracle (same pattern
    * as [[GraphRank.oracleSql]]). */
  def oracleSql(iterations: Int = 4): String = {
    val base =
      """WITH seq AS (
        |  SELECT page, LEAD(page) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS next
        |  FROM (SELECT CAST(props->>'k' AS INTEGER) AS page,
        |          user_id, ts, event_id FROM events)
        |  WHERE page IS NOT NULL),
        |dedges AS (
        |  SELECT page AS src, next AS dst, COUNT(*) AS w
        |  FROM seq WHERE next IS NOT NULL
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT src, dst, SUM(w) AS w FROM (
        |    SELECT src, dst, w FROM dedges
        |    UNION ALL
        |    SELECT dst AS src, src AS dst, w FROM dedges)
        |  WHERE src <> dst GROUP BY 1, 2),
        |nodes AS (SELECT DISTINCT src AS page FROM e),
        |l0 AS (SELECT page, page AS label FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { i =>
      val p = s"l${i - 1}"
      s"""v$i AS (
         |  SELECT e.dst AS page, l.label, SUM(e.w) AS wt
         |  FROM e JOIN $p l ON e.src = l.page GROUP BY 1, 2),
         |l$i AS (
         |  SELECT page, label FROM (
         |    SELECT page, label, ROW_NUMBER() OVER (
         |      PARTITION BY page ORDER BY wt DESC, label ASC) AS rn
         |    FROM v$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters,
       |sizes AS (
       |  SELECT label, COUNT(*) AS csize FROM l$iterations GROUP BY 1)
       |SELECT l.page, l.label AS community, s.csize
       |FROM l$iterations l JOIN sizes s ON l.label = s.label
       |ORDER BY l.page""".stripMargin
  }
}
