package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.util.Checkpoints

/** The `graft.checkpoint.dir` session conf flips every iterative
  * operator's per-iteration lineage barrier from executor-local
  * `localCheckpoint` (fast, dies with an executor) to RELIABLE
  * `checkpoint()` into the named directory (survives executor loss —
  * the fault-tolerance mode a multi-hour 1000-executor iteration
  * runs in). This spec drives both modes through the shared helper
  * and through a real iterative operator. */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("default mode: local checkpoint, nothing written to any dir") {
    spark.conf.unset(Checkpoints.ConfKey)
    val df = (1 to 100).toDF("x").withColumn("y", col("x") * 2)
    val t = Checkpoints.truncate(df)
    assert(t.count() == 100L)
    assert(t.agg(sum("y")).head.getLong(0) == 10100L)
    // lineage is actually cut: the truncated plan is a scan, not
    // the original project over a range
    assert(t.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.nodeName.contains("LogicalRDD")))
  }

  test("reliable mode: checkpoint files land in graft.checkpoint.dir") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val df = (1 to 50).toDF("x").withColumn("y", col("x") + 1)
      val t = Checkpoints.truncate(df)
      assert(t.count() == 50L)
      assert(t.agg(sum("y")).head.getLong(0) == (2 to 51).sum.toLong)
      // the reliable dir now holds RDD checkpoint data
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .toArray.map(_.toString)
      assert(files.exists(_.contains("rdd-")),
        s"no rdd checkpoint under $dir: ${files.take(5).mkString(",")}")
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("switching to a dir that is a SUBSTRING of the installed one " +
    "really switches (no substring-match false positive)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_ckpt_sw").toString
    val longDir = s"$base/ckpt-a"   // installed first
    val shortDir = s"$base/ckpt"    // a substring of longDir
    spark.conf.set(Checkpoints.ConfKey, longDir)
    try {
      Checkpoints.truncate((1 to 10).toDF("x")).count()
      val afterLong = spark.sparkContext.getCheckpointDir.get
      assert(afterLong.contains("ckpt-a"))
      // flip the conf to the substring dir: data must now land THERE
      spark.conf.set(Checkpoints.ConfKey, shortDir)
      Checkpoints.truncate((1 to 10).toDF("x")).count()
      val afterShort = spark.sparkContext.getCheckpointDir.get
      assert(afterShort != afterLong &&
        !afterShort.contains("ckpt-a") && afterShort.contains("ckpt"),
        s"checkpoint dir did not switch: $afterShort")
      val files = java.nio.file.Files
        .walk(java.nio.file.Paths.get(shortDir))
        .toArray.map(_.toString)
      assert(files.exists(_.contains("rdd-")),
        s"no rdd data under the switched dir $shortDir")
      // and the same dir re-set is NOT reinstalled (uuid unchanged)
      Checkpoints.truncate((1 to 10).toDF("x")).count()
      assert(spark.sparkContext.getCheckpointDir.get == afterShort)
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("an iterative operator runs correctly under reliable mode") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_pr").toString
    // a 4-node cycle with a dangling node: 1->2->3->1, 3->4
    val edges = Seq((1, 2, 1L), (2, 3, 1L), (3, 1, 1L), (3, 4, 1L))
      .toDF("src", "dst", "w")
    val local = graft.operators.GraphRank
      .pagerank(spark, edges, iterations = 3).collect()
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val reliable = graft.operators.GraphRank
        .pagerank(spark, edges, iterations = 3).collect()
      // identical fixpoint regardless of checkpoint mode
      assert(local.map(_.toString).toSeq ==
        reliable.map(_.toString).toSeq)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .toArray.map(_.toString)
      assert(files.exists(_.contains("rdd-")), s"no rdd data under $dir")
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }
}
