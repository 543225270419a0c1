package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.lake.{ChangeFeed, TableLog}

class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshPath() =
    Files.createTempDirectory("graft_cdf").resolve("t").toString

  private def feed(path: String, from: Int, to: Int) =
    ChangeFeed.changes(spark, path, from, to)
      .as[(Long, String, String, Long)].collect().toSet

  test("append commit feeds pure inserts and never opens carried dirs") {
    val path = freshPath()
    TableLog.commitAppend(spark, path, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    TableLog.commitAppend(spark, path, Seq((3L, "c")).toDF("id", "v"))
    assert(feed(path, 1, 2) == Set((3L, "c", "insert", 1L)))
    // the v1 dir is shared between the manifests — the read plan skips it
    val d = ChangeFeed.dirDelta(spark, path, 1, 2)
    assert(d.sharedSkipped == 1 && d.removed.isEmpty && d.added.size == 1)
  }

  test("merge update appears as a delete+insert pair; unchanged rows net out") {
    val path = freshPath()
    TableLog.commitMerge(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), Seq("id"))
    TableLog.commitMerge(spark, path,
      Seq((2L, "B2"), (4L, "d")).toDF("id", "v"), Seq("id"))
    // rows 1,3 are rewritten into the new snapshot dir with identical
    // values — multiset netting must erase them from the feed
    assert(feed(path, 1, 2) == Set(
      (2L, "b", "delete", 1L), (2L, "B2", "insert", 1L),
      (4L, "d", "insert", 1L)))
  }

  test("optimize (pure layout rewrite) yields an empty feed") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      (1L to 50L).map(i => (i, i % 7, s"v$i")).toDF("id", "k", "v"))
    TableLog.commitOptimize(spark, path, ("id", "k"), numFiles = 2)
    assert(ChangeFeed.changes(spark, path, 1, 2).isEmpty)
  }

  test("duplicate rows net by count (multiset semantics)") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("id", "v"))
    TableLog.commitOverwrite(spark, path,
      Seq((1L, "x"), (2L, "y"), (2L, "y"), (2L, "y")).toDF("id", "v"))
    assert(feed(path, 1, 2) == Set(
      (1L, "x", "delete", 1L), (2L, "y", "insert", 2L)))
  }

  test("null fields participate in the row fingerprint") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      Seq((1L, Some("a"), None: Option[String])).toDF("id", "x", "y"))
    TableLog.commitOverwrite(spark, path,
      Seq((1L, None: Option[String], Some("a"))).toDF("id", "x", "y"))
    val out = ChangeFeed.changes(spark, path, 1, 2)
      .select("_change_type").as[String].collect().sorted
    assert(out.toSeq == Seq("delete", "insert"))
  }

  test("pure rewrite with -0.0 vs 0.0 doubles nets out (canonical fingerprint)") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      Seq((1L, -0.0d), (2L, 1.5d)).toDF("id", "d"))
    TableLog.commitOverwrite(spark, path,
      Seq((1L, 0.0d), (2L, 1.5d)).toDF("id", "d"))
    assert(ChangeFeed.changes(spark, path, 1, 2).isEmpty)
  }

  test("map column key order does not affect change identity") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path, spark.range(1)
      .select(col("id"), map(lit("a"), lit(1), lit("b"), lit(2)).as("m")))
    TableLog.commitOverwrite(spark, path, spark.range(1)
      .select(col("id"), map(lit("b"), lit(2), lit("a"), lit(1)).as("m")))
    assert(ChangeFeed.changes(spark, path, 1, 2).isEmpty)
  }

  test("commitDelete feed reads only rewritten dirs (stats pruning carries the rest)") {
    val path = freshPath()
    // two range-disjoint append commits → two dirs with disjoint id stats
    TableLog.commitAppend(spark, path,
      (1L to 100L).map(i => (i, s"lo$i")).toDF("id", "v").coalesce(1))
    TableLog.commitAppend(spark, path,
      (1000L to 1100L).map(i => (i, s"hi$i")).toDF("id", "v").coalesce(1))
    val c = TableLog.commitDelete(spark, path, "id", 1040L, 1050L)
    assert(c.action == "delete")
    // the low-range dir is provably untouched: carried verbatim, so the
    // v2→v3 feed shares it and reads only the hi dir + its rewrite
    val d = ChangeFeed.dirDelta(spark, path, 2, 3)
    assert(d.sharedSkipped == 1 && d.removed.size == 1 && d.added.size == 1)
    assert(feed(path, 2, 3) ==
      (1040L to 1050L).map(i => (i, s"hi$i", "delete", 1L)).toSet)
    // total row count reflects the delete
    assert(TableLog.read(spark, path).count() == 100 + 101 - 11)
  }

  test("commitDelete is a version no-op when stats prove nothing matches") {
    val path = freshPath()
    TableLog.commitAppend(spark, path,
      (1L to 10L).map(i => (i, "x")).toDF("id", "v").coalesce(1))
    val before = TableLog.latestVersion(spark, path).get
    val c = TableLog.commitDelete(spark, path, "id", 500L, 600L)
    assert(c.version == before)
    assert(TableLog.latestVersion(spark, path).contains(before))
  }

  test("schema evolution: snapshot read unions file schemas; feed speaks the target schema") {
    val path = freshPath()
    TableLog.commitAppend(spark, path, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // evolved merge: adds column `extra`; pre-evolution rows backfill null
    TableLog.commitMerge(spark, path,
      Seq((2L, "B2", Some("x")), (3L, "c", None: Option[String]))
        .toDF("id", "v", "extra"), Seq("id"))
    val snap = TableLog.read(spark, path)
    assert(snap.columns.toSeq == Seq("id", "v", "extra"))
    assert(snap.count() == 3)
    // evolved append: snapshot now spans directories with BOTH schemas
    TableLog.commitAppend(spark, path,
      Seq((4L, "d", Some("y"))).toDF("id", "v", "extra"))
    assert(TableLog.read(spark, path).count() == 4)
    // feed across the evolution boundary: unchanged row 1 nets out
    // (null-backfilled on both sides), update appears as a pair
    val f = ChangeFeed.changes(spark, path, 1, 2)
      .as[(Long, String, Option[String], String, Long)].collect().toSet
    assert(f == Set(
      (2L, "b", None, "delete", 1L), (2L, "B2", Some("x"), "insert", 1L),
      (3L, "c", None, "insert", 1L)))
  }

  test("commitDelete preserves evolved columns when touched dirs span a schema change") {
    val path = freshPath()
    // dir 1: pre-evolution schema (id, v), ids 1..10
    TableLog.commitAppend(spark, path,
      (1L to 10L).map(i => (i, s"old$i")).toDF("id", "v").coalesce(1))
    // dir 2: evolved schema (id, v, extra), ids 5..15 — ranges overlap,
    // so a delete in the overlap touches BOTH dirs
    TableLog.commitAppend(spark, path,
      (5L to 15L).map(i => (i, s"new$i", Some(s"e$i"))).toDF("id", "v", "extra")
        .coalesce(1))
    TableLog.commitDelete(spark, path, "id", 8L, 9L)
    val snap = TableLog.read(spark, path)
    assert(snap.columns.toSet == Set("id", "v", "extra"))
    // the rewrite must NOT have dropped `extra` from surviving evolved rows
    val extras = snap.where(col("extra").isNotNull)
      .select("extra").as[String].collect().toSet
    assert(extras == (5L to 15L).filterNot(i => i == 8L || i == 9L)
      .map(i => s"e$i").toSet)
    assert(snap.count() == 10 + 11 - 4) // ids 8,9 deleted from both dirs
  }

  test("commitDelete keeps NULL predicate-column rows (range semantics)") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      Seq((Some(1L), "a"), (None: Option[Long], "n"), (Some(5L), "b"))
        .toDF("id", "v"))
    TableLog.commitDelete(spark, path, "id", 0L, 2L)
    val left = TableLog.read(spark, path).select("v").as[String].collect().toSet
    assert(left == Set("n", "b"))
  }
}
