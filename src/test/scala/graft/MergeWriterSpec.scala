package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.MergeWriter
import java.nio.file.Files

class MergeWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fact(rows: (Long, String, Double)*) =
    rows.toDF("store_id", "dt", "revenue")

  test("upsert: updates win on key collision, new keys appended") {
    val target = fact((1L, "d1", 10.0), (2L, "d1", 20.0))
    val updates = fact((2L, "d1", 99.0), (3L, "d2", 30.0))
    val got = MergeWriter.upsert(target, updates, Seq("store_id", "dt"))
      .orderBy("store_id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "d1", 10.0), (2L, "d1", 99.0), (3L, "d2", 30.0)))
  }

  test("upsert is idempotent") {
    val target = fact((1L, "d1", 10.0), (2L, "d1", 20.0))
    val updates = fact((2L, "d1", 99.0), (3L, "d2", 30.0))
    val once = MergeWriter.upsert(target, updates, Seq("store_id", "dt"))
    val twice = MergeWriter.upsert(once, updates, Seq("store_id", "dt"))
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("upsertSyncSchema: added column backfills null, dropped column removed") {
    val target = fact((1L, "d1", 10.0), (2L, "d1", 20.0))
    // new model version: adds n_orders, drops revenue
    val updates = Seq((2L, "d1", 99.0, 5L), (3L, "d2", 30.0, 7L))
      .toDF("store_id", "dt", "revenue", "n_orders")
    val got = MergeWriter.upsertSyncSchema(target, updates, Seq("store_id", "dt"))
    assert(got.columns.toSeq == Seq("store_id", "dt", "revenue", "n_orders"))
    val rows = got.orderBy("store_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // surviving target row 1 gets null n_orders; updates win on key 2
    assert(rows == Seq((1L, "d1", 10.0, -1L), (2L, "d1", 99.0, 5L),
      (3L, "d2", 30.0, 7L)))

    val dropped = MergeWriter.upsertSyncSchema(got,
      fact((4L, "d3", 40.0)), Seq("store_id", "dt"))
    assert(dropped.columns.toSeq == Seq("store_id", "dt", "revenue"))
    assert(dropped.count() == 4)
  }

  test("upsertSyncSchema rejects merge-key type changes (re-key, not sync)") {
    val target = fact((1L, "d1", 10.0))
    val narrowed = Seq((1, "d1", 99.0)).toDF("store_id", "dt", "revenue") // int key
    val e = intercept[IllegalArgumentException] {
      MergeWriter.upsertSyncSchema(target, narrowed, Seq("store_id", "dt"))
    }
    assert(e.getMessage.contains("store_id"))
  }

  test("mergeWrite: schema change between incremental runs (sync_all_columns)") {
    val dir = Files.createTempDirectory("graft_merge_evo").toString + "/fact"
    MergeWriter.mergeWrite(spark, dir,
      fact((1L, "d1", 10.0), (2L, "d2", 20.0)),
      keys = Seq("store_id", "dt"), partitionCols = Seq("dt"))
    // second run adds a column; partition d1 is untouched on disk and
    // keeps the old file schema — the merged read + sync must cope
    MergeWriter.mergeWrite(spark, dir,
      Seq((2L, "d2", 99.0, 5L), (3L, "d3", 30.0, 7L))
        .toDF("store_id", "dt", "revenue", "n_orders"),
      keys = Seq("store_id", "dt"), partitionCols = Seq("dt"))
    val got = spark.read.option("mergeSchema", "true").parquet(dir)
      .select("store_id", "dt", "revenue", "n_orders")
      .orderBy("store_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq((1L, "d1", 10.0, -1L), (2L, "d2", 99.0, 5L),
      (3L, "d3", 30.0, 7L)))
    // third run drops the column again; touched partitions converge to
    // the new model schema
    MergeWriter.mergeWrite(spark, dir,
      fact((3L, "d3", 31.0)),
      keys = Seq("store_id", "dt"), partitionCols = Seq("dt"))
    val d3 = spark.read.option("mergeSchema", "true").parquet(dir)
      .filter(col("dt") === "d3")
    assert(!d3.columns.contains("n_orders") ||
      d3.select("n_orders").collect().forall(_.isNullAt(0)))
    assert(d3.select("revenue").collect().map(_.getDouble(0)).toSeq == Seq(31.0))
  }

  test("mergeWrite: dynamic partition overwrite touches only updated partitions") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/fact"
    MergeWriter.mergeWrite(spark, dir,
      fact((1L, "d1", 10.0), (2L, "d2", 20.0)),
      keys = Seq("store_id", "dt"), partitionCols = Seq("dt"))
    MergeWriter.mergeWrite(spark, dir,
      fact((2L, "d2", 99.0), (3L, "d3", 30.0)),
      keys = Seq("store_id", "dt"), partitionCols = Seq("dt"))
    val got = spark.read.parquet(dir)
      .select("store_id", "dt", "revenue")
      .orderBy("store_id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "d1", 10.0), (2L, "d2", 99.0), (3L, "d3", 30.0)))
  }

  test("mergePlan: rewrite/carry/create per partition with exact post-merge counts") {
    val target = Seq(
      ("p1", 1L), ("p1", 2L), // p1: will receive updates
      ("p2", 3L))             // p2: untouched -> carry
      .toDF("part", "id")
    val updates = Seq(
      ("p1", 2L), // overlaps an existing key -> replaces, not adds
      ("p1", 9L), // new key in existing partition
      ("p3", 7L)) // brand-new partition -> create
      .toDF("part", "id")
    val plan = MergeWriter.mergePlan(target, updates,
      keys = Seq("part", "id"), partitionCols = Seq("part"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(plan("p1") == (2L, 2L, 3L, "rewrite"), s"got $plan")
    assert(plan("p2") == (1L, 0L, 1L, "carry"), s"got $plan")
    assert(plan("p3") == (0L, 1L, 1L, "create"), s"got $plan")
    // the plan's n_after must equal the actual upsert's partition counts
    val merged = MergeWriter.upsert(target, updates, Seq("part", "id"))
      .groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plan.view.mapValues(_._3).toMap ==
      merged ++ Map("p2" -> 1L).filter(_ => merged.contains("p2")),
      s"plan $plan vs actual $merged")
  }

  test("mergePlan: refuses keys that cannot attribute overlap to a partition") {
    val df = Seq(("p1", 1L)).toDF("part", "id")
    intercept[IllegalArgumentException] {
      MergeWriter.mergePlan(df, df, keys = Seq("id"),
        partitionCols = Seq("part"))
    }
  }
}
