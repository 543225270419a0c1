package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query at a given sf dir and print its plan.
  * Usage: runMain graft.QueryProbe <name> <sfDir> [explain] */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("explain"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    if (args.contains("schema")) name.split(",").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      println(s"[schema] $q " + df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
    if (args.contains("show"))
      SparkEntry.queries(name)(spark, sfDir).show(50, truncate = false)
    // time construction + execution: operators may do eager work
    // (cache warm-up) at construction, like Bench measures. Repeat to
    // separate first-run overhead (codegen compile, file listing, JIT)
    // from steady-state cost.
    val reps =
      if (args.contains("schema")) 0
      else sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name rep=$r rows=$n time=$dt%.2fs")
    }
    spark.stop()
  }
}
