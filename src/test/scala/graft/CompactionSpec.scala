package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.lake.Compaction

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = (0 until 2000).map { i =>
    (i.toLong, s"2024-01-0${1 + i % 3}", s"payload_$i num ${i * 7}")
  }.toDF("id", "dt", "payload")

  private def freshPath() =
    Files.createTempDirectory("graft_compaction").resolve("t").toString

  private def listFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
  }

  test("fragmented partitions compact to the byte-budget file count") {
    val path = freshPath()
    // 8 writer tasks per partition => 24 small files over 3 dt partitions
    fixture.repartition(8).write.partitionBy("dt").parquet(path)
    assert(listFiles(path).size == 24)
    val before = spark.read.parquet(path).orderBy("id").collect()

    val report = Compaction.compact(spark, path, Seq("dt"),
      targetFileBytes = 512L * 1024 * 1024)
    assert(report.rewritten == 3)
    assert(report.filesBefore == 24 && report.filesAfter == 3)
    assert(listFiles(path).size == 3)
    // contents byte-identical
    val after = spark.read.parquet(path).orderBy("id").collect()
    assert(after.toSeq == before.toSeq)
  }

  test("an already-compact table is a no-op") {
    val path = freshPath()
    fixture.repartition(8).write.partitionBy("dt").parquet(path)
    Compaction.compact(spark, path, Seq("dt"), targetFileBytes = 512L * 1024 * 1024)
    val again = Compaction.compact(spark, path, Seq("dt"),
      targetFileBytes = 512L * 1024 * 1024)
    assert(again.rewritten == 0)
    assert(listFiles(path).size == 3)
  }

  test("a tiny byte budget splits partitions into multiple right-sized files") {
    val path = freshPath()
    fixture.repartition(8).write.partitionBy("dt").parquet(path)
    val planned = Compaction.plan(spark, path, targetFileBytes = 20L * 1024)
    val report = Compaction.compact(spark, path, Seq("dt"),
      targetFileBytes = 20L * 1024)
    assert(report.rewritten > 0)
    val perPartition = listFiles(path).groupBy(_.getParentFile.getName)
    planned.foreach { p =>
      val got = perPartition(p.partitionPath.split('/').head).size
      assert(got == p.targetFiles,
        s"partition ${p.partitionPath}: got $got files, planned ${p.targetFiles}")
    }
    val after = spark.read.parquet(path).orderBy("id").collect()
    assert(after.length == 2000)
  }

  test("null partition values are rejected loudly, not silently skipped") {
    val path = freshPath()
    (0 until 100).map(i =>
      (i.toLong, if (i % 2 == 0) "2024-01-01" else null, s"p$i"))
      .toDF("id", "dt", "payload")
      .repartition(4).write.partitionBy("dt").parquet(path)
    val ex = intercept[IllegalArgumentException] {
      Compaction.compact(spark, path, Seq("dt"),
        targetFileBytes = 512L * 1024 * 1024)
    }
    assert(ex.getMessage.contains("HIVE_DEFAULT_PARTITION"))
  }

  test("unpartitioned table coalesces when fragmented") {
    val path = freshPath()
    fixture.repartition(10).write.parquet(path)
    assert(listFiles(path).size == 10)
    val report = Compaction.compact(spark, path, Seq.empty,
      targetFileBytes = 512L * 1024 * 1024)
    assert(report.rewritten == 1)
    assert(listFiles(path).size == 1)
    assert(spark.read.parquet(path).count() == 2000)
  }
}
