package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.{TableLog, TextIndex}
import java.nio.file.Files

class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String = {
    val path = Files.createTempDirectory("graft_trgm").resolve("t").toString
    // 4 commits × 2 files; a rare phrase planted in exactly one doc
    val docs = (1L to 200L).map { i =>
      val text =
        if (i == 137L) s"common words here plus the zebra quartz phrase $i"
        else s"common words here and filler text number $i"
      (i, text)
    }.toDF("id", "text")
    (0 until 4).foreach { c =>
      TableLog.commitAppend(spark, path,
        docs.filter(col("id") % 4 === c).repartition(2))
    }
    path
  }

  test("substring probe opens ~one file, results exact, negatives open zero") {
    val path = freshTable()
    assert(TextIndex.ensure(spark, path, Seq("text")).size == 4)
    // the planted phrase: exact result through the pruned read
    val hit = TableLog.readWhereContains(spark, path, "text", "zebra quartz")
      .select("id").as[Long].collect().toSeq
    assert(hit == Seq(137L))
    // pruning: the phrase's trigrams live in one file (fpp-bounded
    // false positives allowed, but far fewer than all 8 files)
    val (kept, total) = TableLog.pruneReportContains(
      spark, path, "text", "zebra quartz")
    assert(total == 8 && kept <= 2, s"kept $kept of $total files")
    // a needle whose trigrams exist nowhere prunes everything
    val (keptNeg, _) = TableLog.pruneReportContains(
      spark, path, "text", "xylophone jukebox")
    assert(keptNeg == 0)
    assert(TableLog.readWhereContains(
      spark, path, "text", "xylophone jukebox").count() == 0)
    // a common needle keeps every file and still returns exact rows
    assert(TableLog.readWhereContains(spark, path, "text", "common words")
      .count() == 200)
  }

  test("short needles and sidecar-less dirs degrade to exact full scans") {
    val path = freshTable()
    TextIndex.ensure(spark, path, Seq("text"))
    // 2-char needle: no trigram to test → full scan, still exact
    assert(TableLog.readWhereContains(spark, path, "text", "37").count() ==
      (1L to 200L).count(_.toString.contains("37")))
    // append WITHOUT re-indexing: the new dir has no sidecar and must
    // stay un-pruned (conservative), so the new row is found
    TableLog.commitAppend(spark, path,
      Seq((999L, "a fresh zebra quartz document")).toDF("id", "text"))
    val hits = TableLog.readWhereContains(spark, path, "text", "zebra quartz")
      .select("id").as[Long].collect().toSet
    assert(hits == Set(137L, 999L))
    // ensure() backfills ONLY the new dir
    assert(TextIndex.ensure(spark, path, Seq("text")).size == 1)
    assert(TableLog.readWhereContains(spark, path, "text", "zebra quartz")
      .select("id").as[Long].collect().toSet == Set(137L, 999L))
  }
}
