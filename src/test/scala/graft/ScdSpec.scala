package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scd

/** SCD2 contract on hand-built feeds: consecutive-duplicate collapse,
  * half-open interval chaining with exactly one current row per key,
  * and point-in-time attribution incl. the exact-boundary rule
  * (a fact AT a change instant belongs to the NEW version). */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def feed(rows: (Long, String, Int)*) =
    rows.zipWithIndex.map { case ((u, ts, a), i) => (u, ts, i.toLong, a) }
      .toDF("user_id", "ts_s", "event_id", "attr_in")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  private def build(f: org.apache.spark.sql.DataFrame) =
    Scd.scd2Build(f, "user_id", col("attr_in"))

  test("consecutive re-statements collapse; intervals chain half-open") {
    val rows = build(feed(
      (1L, "2024-01-01 00:00:00", 10),
      (1L, "2024-01-02 00:00:00", 10), // re-stated, not a change
      (1L, "2024-01-03 00:00:00", 20),
      (1L, "2024-01-05 00:00:00", 10)))
      .orderBy("valid_from").collect()
    assert(rows.length == 3, s"got ${rows.length} versions")
    assert(rows.map(_.getAs[Int]("attr")).toSeq == Seq(10, 20, 10))
    // each valid_to equals the next valid_from
    assert(rows(0).getAs[java.sql.Timestamp]("valid_to") ==
      rows(1).getAs[java.sql.Timestamp]("valid_from"))
    assert(rows(1).getAs[java.sql.Timestamp]("valid_to") ==
      rows(2).getAs[java.sql.Timestamp]("valid_from"))
    // exactly one open current row
    assert(rows.count(_.getAs[Boolean]("is_current")) == 1)
    assert(rows(2).getAs[Boolean]("is_current"))
  }

  test("keys version independently") {
    val rows = build(feed(
      (1L, "2024-01-01 00:00:00", 1), (1L, "2024-01-02 00:00:00", 2),
      (2L, "2024-01-01 00:00:00", 9)))
      .collect()
    assert(rows.count(_.getLong(0) == 1L) == 2)
    assert(rows.count(_.getLong(0) == 2L) == 1)
    assert(rows.filter(_.getLong(0) == 2L).head.getAs[Boolean]("is_current"))
  }

  test("point-in-time join picks the version valid at fact time; boundary goes to the new version") {
    val dim = build(feed(
      (1L, "2024-01-01 00:00:00", 10),
      (1L, "2024-01-03 00:00:00", 20)))
    val facts = Seq(
      (1L, "2024-01-02 12:00:00", 5.0), // inside v1
      (1L, "2024-01-03 00:00:00", 7.0), // AT the change: new version
      (1L, "2024-01-09 00:00:00", 9.0), // open current row
      (2L, "2024-01-02 00:00:00", 1.0), // no dimension row: drops
      (1L, "2023-12-30 00:00:00", 2.0)) // before first version: drops
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val joined = Scd.pointInTimeJoin(facts, dim, "user_id")
      .select(facts("value"), dim("attr")).collect()
      .map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(joined == Map(5.0 -> 10, 7.0 -> 20, 9.0 -> 20), s"got $joined")
  }

  test("validity intervals partition the timeline: no fact matches twice") {
    val dim = build(feed(
      (1L, "2024-01-01 00:00:00", 1),
      (1L, "2024-01-02 00:00:00", 2),
      (1L, "2024-01-03 00:00:00", 3)))
    val facts = (0 until 20).map(h =>
      (1L, f"2024-01-02 $h%02d:30:00", 1.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val n = Scd.pointInTimeJoin(facts, dim, "user_id").count()
    assert(n == 20L, s"each fact must match exactly once, got $n")
  }

  test("incremental merge equals full rebuild on the concatenated feed") {
    val f1 = feed(
      (1L, "2024-01-01 00:00:00", 10), (1L, "2024-01-03 00:00:00", 20),
      (2L, "2024-01-01 00:00:00", 5),
      (3L, "2024-01-02 00:00:00", 7))
    // batch touches keys 1 (new change) and 4 (new key); 2 and 3 untouched
    val f2raw = Seq(
      (1L, "2024-01-06 00:00:00", 100L, 30),
      (1L, "2024-01-08 00:00:00", 101L, 30), // re-statement, collapses
      (4L, "2024-01-07 00:00:00", 102L, 1))
    val f2 = f2raw.toDF("user_id", "ts_s", "event_id", "attr_in")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

    val incremental = Scd.scd2Merge(build(f1), f2, "user_id", col("attr_in"))
    val full = build(f1.unionByName(f2))
    val key = Seq("user_id", "valid_from")
    val a = incremental.orderBy(key.map(col): _*)
      .select("user_id", "attr", "valid_from", "valid_to", "is_current")
      .collect().toSeq
    val b = full.orderBy(key.map(col): _*)
      .select("user_id", "attr", "valid_from", "valid_to", "is_current")
      .collect().toSeq
    assert(a == b, s"incremental\n${a.mkString("\n")}\nvs full\n${b.mkString("\n")}")
    // untouched keys flow through; touched key 1 has a new open version
    val cur1 = incremental.where(col("user_id") === 1 && col("is_current"))
      .collect()
    assert(cur1.length == 1 && cur1.head.getAs[Int]("attr") == 30)
  }
}
