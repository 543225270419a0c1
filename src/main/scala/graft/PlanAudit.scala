package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: render every query's physical plan and flag scale
  * anti-patterns — nested-loop/cartesian joins where a hash join was
  * expected, and parquet scans that push no filters despite the query
  * filtering. Intentional nested loops (query-vs-candidate cross
  * products against a broadcast side) are allowlisted.
  *
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {

  /** Queries whose cross/NLJ shape is by design: a tiny broadcast query
    * set against every candidate (brute-force similarity) or an
    * explicit bounded all-pairs block. */
  private val intentionalNlj = Set(
    "q19_ngram_jaccard", "q20_embedding_topk", "q21_ivf_ann",
    "q22_embedding_neardup")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
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
        val badNlj = (count("BroadcastNestedLoopJoin") + count("CartesianProduct")) > 0 &&
          !intentionalNlj.contains(name)
        val flag = if (badNlj) { flagged += 1; "  <-- UNEXPECTED NLJ" } else ""
        val joinStr = joins.map { case (k, v) => s"$k x$v" }.mkString(", ")
        println(f"[audit] $name%-24s shuffles=$shuffles%-2d joins=[$joinStr]$flag")
      } catch {
        case e: Throwable =>
          println(s"[audit] $name PLAN FAILED: ${e.getMessage.linesIterator.next()}")
          flagged += 1
      }
    }
    println(s"[audit] flagged=$flagged")
    spark.stop()
  }
}
