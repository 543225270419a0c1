package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.lake.{BloomIndex, TableLog}

class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshPath() =
    Files.createTempDirectory("graft_bloom").resolve("t").toString

  /** A table where min/max stats CANNOT prune a point lookup: ids are
    * dealt round-robin across commits, so every file's [min, max]
    * spans nearly the whole key domain. */
  private def roundRobinTable(path: String, commits: Int, rows: Int): Unit =
    (0 until commits).foreach { c =>
      val ids = (0 until rows).map(i => i.toLong * commits + c)
      TableLog.commitAppend(spark, path,
        ids.map(i => (i, s"payload_$i")).toDF("id", "payload")
          .repartition(2))
    }

  test("point lookup prunes to ~one file where min/max keeps everything") {
    val path = freshPath()
    roundRobinTable(path, commits = 4, rows = 2000)
    assert(BloomIndex.ensure(spark, path, Seq("id")).size == 4)
    // re-running indexes nothing new (incremental by construction)
    assert(BloomIndex.ensure(spark, path, Seq("id")).isEmpty)

    val probe = 1234L * 4 + 1 // lives in commit 1
    val (ranged, bloomed, total) =
      TableLog.pruneReportEq(spark, path, "id", probe)
    // interleaved keys: range stats keep every file...
    assert(ranged == total && total == 8)
    // ...the bloom tier cuts to the file(s) that can hold the value
    // (2 files/commit; at fpp=0.01 false positives are possible but
    // 8 files can't all pass)
    assert(bloomed <= 2, s"bloom kept $bloomed of $total files")

    val got = TableLog.readWhereEq(spark, path, "id", probe)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((probe, s"payload_$probe")))
    // exactness on a missing key: empty, never wrong
    assert(TableLog.readWhereEq(spark, path, "id", -5L).isEmpty)
  }

  test("readWhereEq == read().filter() across the key domain (exactness property)") {
    val path = freshPath()
    roundRobinTable(path, commits = 3, rows = 500)
    BloomIndex.ensure(spark, path, Seq("id", "payload"))
    val all = TableLog.read(spark, path)
    Seq(0L, 7L * 3 + 2, 499L * 3, 123456789L).foreach { k =>
      val expect = all.filter(col("id") === k)
        .as[(Long, String)].collect().toSet
      val got = TableLog.readWhereEq(spark, path, "id", k)
        .as[(Long, String)].collect().toSet
      assert(got == expect, s"mismatch for id=$k")
    }
    // string-typed probe path
    val expect = all.filter(col("payload") === "payload_301")
      .as[(Long, String)].collect().toSet
    assert(TableLog.readWhereEq(spark, path, "payload", "payload_301")
      .as[(Long, String)].collect().toSet == expect)
  }

  test("appends after an index backfill: new dir prunes once re-ensured, old dirs untouched") {
    val path = freshPath()
    roundRobinTable(path, commits = 2, rows = 300)
    BloomIndex.ensure(spark, path, Seq("id"))
    // a later append has no sidecar yet — its files prune
    // conservatively (kept), correctness unaffected
    TableLog.commitAppend(spark, path,
      Seq((1000000L, "late")).toDF("id", "payload"))
    val got = TableLog.readWhereEq(spark, path, "id", 1000000L)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1000000L, "late")))
    // ensure() indexes exactly the one new dir
    assert(BloomIndex.ensure(spark, path, Seq("id")).size == 1)
    val (_, bloomed, total) =
      TableLog.pruneReportEq(spark, path, "id", 1000000L)
    assert(total == 5 && bloomed <= 1)
  }

  test("sidecar survives schema evolution and the dir-carry of later commits") {
    val path = freshPath()
    TableLog.commitAppend(spark, path,
      (0L until 400L).map(i => (i, s"v$i")).toDF("id", "v"))
    BloomIndex.ensure(spark, path, Seq("id"))
    // evolved append carries the indexed dir forward verbatim
    TableLog.commitAppend(spark, path,
      Seq((9999L, "x", 7L)).toDF("id", "v", "extra"))
    val got = TableLog.readWhereEq(spark, path, "id", 42L)
    assert(got.columns.toSeq == Seq("id", "v", "extra"))
    assert(got.select("id", "v", "extra")
      .as[(Long, String, Option[Long])].collect().toSeq ==
      Seq((42L, "v42", None)))
  }
}
