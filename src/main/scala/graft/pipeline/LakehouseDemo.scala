package graft.pipeline

import org.apache.spark.sql.SparkSession

/** CLI equivalent of the reference's `python local_runner.py
  * --output-dir ./local_output` (reference `local_runner.py:187-192`):
  * run the whole sample pipeline locally and print the fact preview.
  *
  * Usage: runMain graft.pipeline.LakehouseDemo [rawDir] [outDir]
  * With no rawDir, the bundled sample fixtures are materialized to a
  * temp directory first.
  */
object LakehouseDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("lakehouse-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rawDir =
      if (args.length > 0) args(0)
      else SampleData.writeTo(
        graft.util.TempDirs.create("graft_samples").toString)
    val outDir = if (args.length > 1) Some(args(1)) else None
    val fact = Lakehouse.run(spark, rawDir, outDir)
    println("fct_daily_store_metrics:")
    fact.show(20, truncate = false)
    outDir.foreach(d => println(s"outputs written under $d"))
    spark.stop()
  }
}
