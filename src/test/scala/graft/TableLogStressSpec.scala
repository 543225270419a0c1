package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.lake.TableLog

/** Concurrent-writer STRESS net for the table log, beyond
  * TableLogSpec's two happy-path races: overlapping-key merge storms,
  * a mixed append/merge/delete storm replayed commit-for-commit
  * against every historical snapshot, and readers racing the storm
  * that must never observe a torn batch. The commit protocol under
  * test is the manifest hard-link publish (create-if-absent) with
  * losers recomputing on the winner's snapshot. */
class TableLogStressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshPath() =
    Files.createTempDirectory("graft_tlstress").resolve("t").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  private def orphanCheck(path: String): Unit = {
    val dataDirs = new java.io.File(s"$path/data")
      .listFiles().map(_.getName).toSet
    val referenced = TableLog.history(spark, path)
      .flatMap(_.dirs).map(_.stripPrefix("data/")).toSet
    assert(dataDirs == referenced,
      s"orphaned dirs: ${dataDirs.diff(referenced)}")
  }

  test("overlapping-key merge storm: dense versions, the final state is " +
    "the max-version writer's value, no orphans") {
    val path = freshPath()
    TableLog.commitMerge(spark, path,
      Seq((1L, "base")).toDF("id", "v"), Seq("id"))
    val writers = 8
    // every writer upserts the SAME key — maximum contention; each
    // loser must recompute on the winner's snapshot, so the final
    // value must be exactly the value of the highest-version commit
    val got = Await.result(
      Future.sequence((1 to writers).map { i =>
        Future {
          val c = TableLog.commitMerge(spark, path,
            Seq((1L, s"w$i")).toDF("id", "v"), Seq("id"))
          (c.version, s"w$i")
        }
      }), 300.seconds)
    assert(got.map(_._1).sorted == (2 to writers + 1),
      s"versions not dense: ${got.map(_._1).sorted}")
    val lastWriter = got.maxBy(_._1)._2
    assert(rows(TableLog.read(spark, path)) == Set((1L, lastWriter)),
      s"final state is not the max-version writer's value ($lastWriter)")
    orphanCheck(path)
  }

  test("mixed append/merge/delete storm: every historical snapshot equals " +
    "a commit-for-commit replay in version order") {
    val path = freshPath()
    val seed = (1000L to 1009L).map(i => (i, "seed"))
    TableLog.commitAppend(spark, path, seed.toDF("id", "v"))

    sealed trait Op
    case class Add(rows: Set[(Long, String)]) extends Op
    case class Upsert(rows: Set[(Long, String)]) extends Op
    case class Del(lo: Long, hi: Long) extends Op

    // 4 appends + 4 merges on disjoint fresh keys, 2 deletes on seed
    // sub-ranges — all racing
    val work: Seq[(Int, () => (Int, Op))] =
      (1 to 4).map { i => (i, () => {
        val rs = (i * 100L to i * 100L + 2).map(k => (k, s"a$i")).toSet
        val c = TableLog.commitAppend(spark, path, rs.toSeq.toDF("id", "v"))
        (c.version, Add(rs): Op)
      })} ++
      (1 to 4).map { i => (10 + i, () => {
        val rs = (i * 1000L + 10000L to i * 1000L + 10002L)
          .map(k => (k, s"m$i")).toSet
        val c = TableLog.commitMerge(spark, path,
          rs.toSeq.toDF("id", "v"), Seq("id"))
        (c.version, Upsert(rs): Op)
      })} ++
      Seq((20, () => {
        val c = TableLog.commitDelete(spark, path, "id", 1000L, 1001L)
        (c.version, Del(1000L, 1001L): Op)
      }), (21, () => {
        val c = TableLog.commitDelete(spark, path, "id", 1004L, 1005L)
        (c.version, Del(1004L, 1005L): Op)
      }))

    val committed = Await.result(
      Future.sequence(work.map { case (_, f) => Future(f()) }),
      300.seconds)
    val byVersion = committed.toMap
    assert(byVersion.keySet == (2 to work.size + 1).toSet,
      s"versions not dense: ${byVersion.keySet.toSeq.sorted}")

    // replay every commit in version order; each historical snapshot
    // must equal the replayed state EXACTLY — a commit that partially
    // applied, double-applied, or was built on a stale snapshot
    // diverges somewhere in this walk
    var state: Set[(Long, String)] = seed.toSet
    (2 to work.size + 1).foreach { v =>
      state = byVersion(v) match {
        case Add(rs) => state ++ rs
        case Upsert(rs) =>
          val keys = rs.map(_._1)
          state.filterNot(r => keys.contains(r._1)) ++ rs
        case Del(lo, hi) => state.filterNot(r => r._1 >= lo && r._1 <= hi)
      }
      assert(rows(TableLog.read(spark, path, Some(v))) == state,
        s"snapshot v$v diverges from the serial replay")
    }
    orphanCheck(path)
  }

  test("readers racing the storm never observe a torn batch") {
    val path = freshPath()
    TableLog.commitAppend(spark, path, Seq((0L, "b0")).toDF("id", "v"))
    val batches = 6
    val rowsPerBatch = 5
    val writers = Future.sequence((1 to batches).map { i =>
      Future(TableLog.commitAppend(spark, path,
        (1 to rowsPerBatch).map(j => (i * 100L + j, s"b$i"))
          .toDF("id", "v")))
    })
    // hammer reads while the writers land: every observed snapshot
    // must contain each batch either COMPLETELY or not at all —
    // a torn read means the manifest pointed at half-written data
    var reads = 0
    while (!writers.isCompleted) {
      val snap = rows(TableLog.read(spark, path))
      val byBatch = snap.groupBy(_._2).view.mapValues(_.size).toMap
      (1 to batches).foreach { i =>
        val n = byBatch.getOrElse(s"b$i", 0)
        assert(n == 0 || n == rowsPerBatch,
          s"torn batch b$i: saw $n of $rowsPerBatch rows")
      }
      reads += 1
    }
    Await.result(writers, 300.seconds)
    assert(reads > 0, "reader never ran while writers were active")
    val finalSnap = rows(TableLog.read(spark, path))
    assert(finalSnap.size == 1 + batches * rowsPerBatch)
    orphanCheck(path)
  }
}
