package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}

/** Physical-layout advisor: mine a workload's ANALYZED plans for the
  * base-table columns its filters and join keys actually touch, and
  * rank them — the evidence a Z-order / partition / bucket-column
  * decision should come from (the workload-driven clustering-key
  * selection every lakehouse table format asks its users to do by
  * hand). [[graft.lake.ZOrder]] consumes the winner; [[PlanAudit]]
  * checks plans for anti-patterns, THIS recommends the layout that
  * makes pruning possible in the first place.
  *
  * Works on metadata only: each query contributes its logical plan,
  * filter/join attribute references resolve to physical
  * (table, column) leaves through [[ColumnLineage]]'s ExprId walk
  * (so a predicate on a DERIVED column credits the base columns it
  * was computed from), and no data is read. Cost is O(plan nodes)
  * per query at any corpus size. */
object LayoutAdvisor {

  /** Per (table, column): how many of the workload's plans filter on
    * it and how many join on it, plus a per-table usefulness rank
    * (filters weighted over joins — pruning serves filters first;
    * ties to the column name). */
  def predicateProfile(spark: SparkSession,
      workload: Seq[DataFrame]): DataFrame = {
    import spark.implicits._
    val hits = workload.flatMap { df =>
      val plan = df.queryExecution.analyzed
      // resolve references against EACH node's own subtree:
      // ColumnLineage.resolve returns the mapping for a plan's OUTPUT
      // attributes only (projections/aggregates rebase the id space),
      // so a filter sitting under an aggregate must be resolved
      // against its child's map, not the query top's
      def resolveAt(child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          refs: Iterable[org.apache.spark.sql.catalyst.expressions.Attribute]) = {
        val leaves = ColumnLineage.resolve(child)
        refs.toSeq.flatMap(a => leaves.getOrElse(a.exprId.id, Set.empty))
          // only physical tables advise layout; literals/local
          // relations (named <...>) do not
          .filterNot(_._1.startsWith("<"))
      }
      val filterRefs = plan.collect {
        case f: Filter => resolveAt(f.child, f.condition.references.toSeq)
      }.flatten.distinct.map(tc => (tc._1, tc._2, 1, 0))
      val joinRefs = plan.collect {
        case j: Join => resolveAt(j,
          j.condition.toSeq.flatMap(_.references.toSeq))
      }.flatten.distinct.map(tc => (tc._1, tc._2, 0, 1))
      filterRefs ++ joinRefs
    }
    val agg = hits.groupBy(h => (h._1, h._2)).map { case ((t, c), hs) =>
      (t, c, hs.map(_._3).sum.toLong, hs.map(_._4).sum.toLong)
    }.toSeq
    val ranked = agg.groupBy(_._1).toSeq.flatMap { case (_, cols) =>
      cols.sortBy { case (_, c, nf, nj) => (-(nf * 2 + nj), c) }
        .zipWithIndex
        .map { case ((t, c, nf, nj), i) => (t, c, nf, nj, (i + 1).toLong) }
    }
    ranked.toDF("table", "column", "n_filter_queries",
        "n_join_queries", "rank")
      .orderBy("table", "rank")
  }

  /** Top-`k` layout keys per table — the columns to Z-order/bucket. */
  def recommend(spark: SparkSession, workload: Seq[DataFrame],
      k: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions.col
    predicateProfile(spark, workload).where(col("rank") <= k)
  }
}
