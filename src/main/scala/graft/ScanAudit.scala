package graft

/** Dev tool: per-query count of parquet-scan and cached-scan leaves in
  * the analyzed physical plan — the cheap detector for the
  * multi-consumer-without-persist anti-pattern (a subtree referenced
  * from k plan branches scans its sources k times unless persisted).
  * Plans are built at a small SF (construction may execute eager
  * pipeline steps, like PlanAudit). Output: one line per query, sorted
  * by parquet-scan count descending.
  *
  *   runMain graft.ScanAudit [sfDir] [minScans]
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val minScans = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.map { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val scans = "Scan parquet".r.findAllIn(plan).size
        val mem = "InMemoryTableScan".r.findAllIn(plan).size
        (name, scans, mem, "")
      } catch {
        case e: Throwable => (name, -1, -1, e.getClass.getSimpleName)
      } finally spark.catalog.clearCache()
    }
    rows.sortBy(-_._2).foreach { case (n, s, m, err) =>
      if (s >= minScans || s < 0)
        println(f"[scan] $n%-28s parquetScans=$s%-3d inMemScans=$m%-3d $err")
    }
    spark.stop()
  }
}
