package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.lake.{TableLog, TableStats}

class TableStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshPath() =
    Files.createTempDirectory("graft_stats").resolve("t").toString

  // 4 range-clustered files over id 0..399: file i holds [100i, 100i+99]
  private def clusteredDf() =
    spark.range(0, 400).toDF("id")
      .withColumn("grp", (col("id") / 100).cast("int"))
      .withColumn("name", concat(lit("n"), lpad(col("id").cast("string"), 4, "0")))
      .withColumn("score", col("id").cast("double") / 10.0)
      .withColumn("day", date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("grp") * 30))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("id") * 3600))
      .repartitionByRange(4, col("id"))
      .sortWithinPartitions("id")

  test("manifest stats match the data's true per-file bounds and row counts") {
    val path = freshPath()
    val c = TableLog.commitOverwrite(spark, path, clusteredDf())
    assert(c.stats.size == 4)
    assert(c.stats.map(_.rows).sum == 400L)
    // global min/max over files == dataframe aggregates
    val idMins = c.stats.flatMap(_.cols("id").min).map(_.toLong)
    val idMaxs = c.stats.flatMap(_.cols("id").max).map(_.toLong)
    assert(idMins.min == 0L && idMaxs.max == 399L)
    // files are range-disjoint on id (repartitionByRange), so each file
    // spans exactly 100 ids
    assert(c.stats.forall { f =>
      val mn = f.cols("id").min.get.toLong
      val mx = f.cols("id").max.get.toLong
      mx - mn == 99L
    })
    val nameStats = c.stats.map(_.cols("name"))
    assert(nameStats.flatMap(_.min).min == "n0000")
    assert(nameStats.flatMap(_.max).max == "n0399")
    assert(c.stats.head.cols("score").typ == "double")
    assert(c.stats.head.cols("day").typ == "date")
    assert(c.stats.head.cols("ts").typ == "ts")
  }

  test("readWhere equals read+filter on every supported type, while pruning files") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path, clusteredDf())
    val full = TableLog.read(spark, path)

    def check(colName: String, lo: Any, hi: Any, expectKeptAtMost: Int): Unit = {
      val pruned = TableLog.readWhere(spark, path, colName, lo, hi)
      val expected = full.where(col(colName).between(lit(lo), lit(hi)))
      assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
        expected.select("id").as[Long].collect().sorted.toSeq,
        s"mismatch on $colName")
      val (kept, total) = TableLog.pruneReport(spark, path, colName, lo, hi)
      assert(total == 4)
      assert(kept <= expectKeptAtMost, s"$colName kept $kept files")
    }
    check("id", 120L, 180L, 1)
    check("score", 5.0, 15.0, 2)           // ids 50..150 → 2 files
    check("name", "n0250", "n0260", 1)
    check("day", java.sql.Date.valueOf("2024-02-01"),
      java.sql.Date.valueOf("2024-03-10"), 2) // grp 1 (jan31) + grp 2 (mar1)
    check("ts", java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(1700000000L + 150 * 3600)),
      java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(1700000000L + 160 * 3600)), 1)
    // interval outside all bounds → zero files, empty result
    val (kept0, _) = TableLog.pruneReport(spark, path, "id", 1000L, 2000L)
    assert(kept0 == 0)
    assert(TableLog.readWhere(spark, path, "id", 1000L, 2000L).count() == 0L)
  }

  test("append carries prior stats; count from metadata; rollback keeps stats") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path, clusteredDf())
    TableLog.commitAppend(spark, path,
      spark.range(1000, 1050).toDF("id")
        .withColumn("grp", lit(99))
        .withColumn("name", lit("zzz"))
        .withColumn("score", lit(0.0))
        .withColumn("day", lit(java.sql.Date.valueOf("2030-01-01")))
        .withColumn("ts", timestamp_seconds(lit(1800000000L)))
        .coalesce(1))
    assert(TableLog.countRows(spark, path).contains(450L))
    // pruning still sees both generations: old-range query skips the
    // appended file, appended-range query skips the original four
    assert(TableLog.pruneReport(spark, path, "id", 120L, 180L)._1 == 1)
    assert(TableLog.pruneReport(spark, path, "id", 1000L, 1100L)._1 == 1)
    assert(TableLog.readWhere(spark, path, "id", 990L, 2000L)
      .count() == 50L)
    val rb = TableLog.rollback(spark, path, 1)
    assert(rb.stats.size == 4)
    assert(TableLog.countRows(spark, path).contains(400L))
  }

  test("readWhereIn prunes by value set and equals read + IN filter") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path, clusteredDf())
    val full = TableLog.read(spark, path)
    // values land in files 0 and 3 → exactly 2 of 4 files open
    val vals = Seq(10L, 350L, 399L)
    val got = TableLog.readWhereIn(spark, path, "id", vals)
      .select("id").as[Long].collect().sorted.toSeq
    val want = full.where(col("id").isin(vals: _*))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want && got == vals.sorted)
    val (kept, total) = TableLog.pruneReportIn(spark, path, "id", vals)
    assert(total == 4 && kept == 2, s"kept $kept of $total")
    // no value in any file's bounds → zero files, empty result
    assert(TableLog.pruneReportIn(spark, path, "id", Seq(5000L))._1 == 0)
    assert(TableLog.readWhereIn(spark, path, "id", Seq(5000L)).count() == 0L)
  }

  test("readWhere speaks the snapshot union schema across an evolution") {
    val path = freshPath()
    // dir 1: (id, v), ids 1..100; dir 2: evolved (id, v, extra), 1000..1100
    TableLog.commitAppend(spark, path,
      (1L to 100L).map(i => (i, s"lo$i")).toDF("id", "v").coalesce(1))
    TableLog.commitAppend(spark, path,
      (1000L to 1100L).map(i => (i, s"hi$i", Some(s"e$i")))
        .toDF("id", "v", "extra").coalesce(1))
    val full = TableLog.read(spark, path)
    // prune down to the PRE-evolution dir: `extra` lives only in pruned
    // files, yet must still appear null-backfilled (read().filter parity)
    val low = TableLog.readWhere(spark, path, "id", 10L, 20L)
    assert(low.columns.toSeq == full.columns.toSeq)
    assert(low.count() == 11L && low.where(col("extra").isNull).count() == 11L)
    // prune down to the evolved dir: values survive
    val hi = TableLog.readWhere(spark, path, "id", 1010L, 1020L)
    assert(hi.columns.toSeq == full.columns.toSeq)
    assert(hi.select("extra").as[String].collect().toSet ==
      (1010L to 1020L).map(i => s"e$i").toSet)
  }

  test("nulls never break pruning; stats-less manifests degrade to full scan") {
    val path = freshPath()
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(5L), "c"))
      .toDF("k", "v").coalesce(1)
    TableLog.commitOverwrite(spark, path, df)
    // the null row has no k bound but rows with k in range still return
    assert(TableLog.readWhere(spark, path, "k", 0L, 2L).count() == 1L)
    val c = TableLog.history(spark, path).last
    assert(c.stats.head.cols("k").nulls == 1L)

    // simulate a pre-stats manifest: strip '#' lines
    val logDir = new java.io.File(s"$path/_graft_log")
    val m = logDir.listFiles().filter(_.getName.endsWith(".manifest")).head
    val stripped = scala.io.Source.fromFile(m).getLines()
      .filterNot(_.startsWith("#")).mkString("\n")
    java.nio.file.Files.write(m.toPath, stripped.getBytes("UTF-8"))
    assert(TableLog.countRows(spark, path).isEmpty)
    assert(TableLog.readWhere(spark, path, "k", 0L, 2L).count() == 1L)
  }
}
