package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Funnel, Sampling}

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // u1: full ordered funnel. u2: purchase BEFORE click (must not count
  // step 3). u3: view only. u4: click/purchase but never viewed (must
  // not enter the funnel at all).
  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    (2L, ts("2024-01-01 09:00:00"), "view"),
    (2L, ts("2024-01-01 08:00:00"), "purchase"),
    (2L, ts("2024-01-01 09:30:00"), "click"),
    (3L, ts("2024-01-01 11:00:00"), "view"),
    (4L, ts("2024-01-01 07:00:00"), "click"),
    (4L, ts("2024-01-01 07:30:00"), "purchase"))
    .toDF("user_id", "ts", "event_type")

  test("funnel counts honor strict event ordering per user") {
    val got = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "view", 3L),       // u1, u2, u3
      (2, "click", 2L),      // u1, u2 (u4 never viewed)
      (3, "purchase", 1L)))  // u1 only (u2's purchase precedes click)
  }

  test("funnel picks the EARLIEST qualifying event per step") {
    // u5 clicks twice after viewing; conversion time must be the first
    val e2 = events.unionByName(Seq(
      (5L, ts("2024-01-02 10:00:00"), "view"),
      (5L, ts("2024-01-02 10:20:00"), "click"),
      (5L, ts("2024-01-02 10:05:00"), "click"),
      (5L, ts("2024-01-02 10:06:00"), "purchase"))
      .toDF("user_id", "ts", "event_type"))
    val conv = Funnel.conversions(e2, Seq("view", "click", "purchase"))
      .filter(col("user_id") === 5L).collect()(0)
    assert(conv.getTimestamp(2) == ts("2024-01-02 10:05:00"))  // t_2: first click
    assert(conv.getTimestamp(3) == ts("2024-01-02 10:06:00"))  // t_3 after t_2
    // full-funnel table holds exactly the users who completed all steps
    val users = Funnel.conversions(e2, Seq("view", "click", "purchase"))
      .select("user_id").as[Long].collect().toSet
    assert(users == Set(1L, 5L))
  }

  test("decayedMix: half-life math, shares sum to 1, determinism from pinned asOf") {
    val rows = Seq(
      ("a", ts("2024-01-08 00:00:00"), 10.0),   // 7 days old → decay 0.5
      ("a", ts("2024-01-15 00:00:00"), 10.0),   // 0 days old → decay 1.0
      ("b", ts("2024-01-01 00:00:00"), 10.0))   // 14 days old → decay 0.25
      .toDF("grp", "ts", "value")
    val got = Sampling.decayedMix(rows, Seq("grp"), "ts", "value",
      asOf = "2024-01-15 00:00:00", halfLifeDays = 7.0)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 1.5, 15.0, 0.857143),
      ("b", 1L, 0.25, 2.5, 0.142857)))
  }

  test("containment flags a doc-inside-doc near-superset that Jaccard misses") {
    val core = "alpha beta gamma delta epsilon zeta eta theta"
    val wrapper = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 4) +
      core + (" sed do eiusmod tempor incididunt ut labore et dolore" * 4)
    val docs = Seq((1L, core), (2L, wrapper), (3L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val contained = Dedup.containmentVerify(docs, cands, k = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toMap2
    assert(contained.contains((1L, 2L)))
    assert(contained((1L, 2L)) == 1.0)      // every core shingle is in wrapper
    assert(!contained.contains((1L, 3L)))
    // ...while Jaccard on the same pair is low (large union)
    val j = Dedup.jaccardVerify(docs, cands, k = 3, threshold = 0.0)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("jaccard").as[Double].collect()(0)
    assert(j < 0.3)
  }

  test("cohort retention: first-event week defines the cohort; offsets count distinct-active weeks") {
    // u1 joins week of Jan 1 (Mon), active weeks 0 and 2; u2 joins
    // week of Jan 8, active week 0 only (two events, one week)
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-10 10:00:00")),
      (2L, ts("2024-01-11 10:00:00")))
      .toDF("user_id", "ts")
    val got = graft.operators.Retention.cohortRetention(events)
      .as[(java.sql.Date, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0L, 1L, 1L, 1.0),
      (java.sql.Date.valueOf("2024-01-01"), 2L, 1L, 1L, 1.0),
      (java.sql.Date.valueOf("2024-01-08"), 0L, 1L, 1L, 1.0)))
  }

  test("rfm: quartile grid is deterministic and conserves users") {
    val events = (1L to 16L).flatMap { u =>
      // user u has u events of value u → freq and monetary rank together
      (1L to u).map(i => (u, ts(f"2024-01-${u}%02d 00:00:00"), u.toDouble))
    }.toDF("user_id", "ts", "value")
    val grid = graft.operators.Retention.rfmSegments(events)
    assert(grid.agg(sum("n_users")).collect()(0).getLong(0) == 16L)
    // users 13..16: latest, most frequent, highest value → (4,4,4)
    val top = grid.filter(col("r") === 4 && col("f") === 4 && col("m") === 4)
      .select("n_users").as[Long].collect()(0)
    assert(top == 4L)
    // deterministic across runs
    assert(grid.collect().toSeq ==
      graft.operators.Retention.rfmSegments(events).collect().toSeq)
  }

  test("gap-fill LOCF: full spine, carried values, NULL before first observation") {
    val sparse = Seq(
      (1L, java.sql.Date.valueOf("2024-01-03"), 10.0),
      (1L, java.sql.Date.valueOf("2024-01-05"), 20.0),
      (2L, java.sql.Date.valueOf("2024-01-02"), 5.0))
      .toDF("k", "d", "v")
    val got = graft.operators.GapFill.locf(sparse, "k", "d", "v",
      "2024-01-01", "2024-01-05")
      .as[(Long, java.sql.Date, Option[Double], Boolean)].collect().toSeq
    def day(n: Int) = java.sql.Date.valueOf(f"2024-01-$n%02d")
    assert(got == Seq(
      (1L, day(1), None, false),          // before first obs: stays null
      (1L, day(2), None, false),
      (1L, day(3), Some(10.0), true),
      (1L, day(4), Some(10.0), false),    // carried forward
      (1L, day(5), Some(20.0), true),     // new observation wins
      (2L, day(1), None, false),
      (2L, day(2), Some(5.0), true),
      (2L, day(3), Some(5.0), false),
      (2L, day(4), Some(5.0), false),
      (2L, day(5), Some(5.0), false)))
  }

  implicit class Tuples3ToMap(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("funnel counts are ONE events pass; stepFrames scans once per step") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_scan")
    events.write.mode("overwrite").parquet(s"$dir/events")
    val ev = spark.read.parquet(s"$dir/events")
    // structural walk that crosses AQE wrappers but NOT cache
    // boundaries (an InMemoryTableScan's cached plan is not a child):
    // counts the events-parquet scans THIS action executed
    def walk(p: SparkPlan)(hit: SparkPlan => Int): Int = {
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      hit(p) + kids.map(walk(_)(hit)).sum
    }
    def eventScans(p: SparkPlan): Int = walk(p) {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("graft_funnel_scan")) => 1
      case _ => 0
    }
    // count tier: the whole 3-step funnel is ONE events scan (chained
    // same-spec window mins), zero caches to manage
    val out = Funnel.funnel(ev, Seq("view", "click", "purchase"))
    val plan = out.queryExecution.executedPlan
    assert(eventScans(plan) == 1,
      "funnel counts must be a single events pass")
    val countCaches = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[InMemoryTableScanExec]
      walk(plan) { case m: InMemoryTableScanExec => acc += m; 1; case _ => 0 }
      acc.toSeq
    }
    assert(countCaches.isEmpty, "funnel counts must not persist anything")
    assert(out.count() == 3)
    // drill-down tier: each step's materialization scans events
    // exactly ONCE, and the previous step arrives as a cache
    // reference, not a re-derived subtree — N events scans total (3
    // here), never the N(N+1)/2 of a prefix re-derivation
    val frames = Funnel.stepFrames(ev, Seq("view", "click", "purchase"))
    assert(frames.length == 3)
    frames.foreach { f =>
      val caches = {
        val acc = scala.collection.mutable.ArrayBuffer.empty[InMemoryTableScanExec]
        walk(f.queryExecution.executedPlan) {
          case m: InMemoryTableScanExec => acc += m; 1; case _ => 0 }
        acc.toSeq
      }
      assert(caches.length == 1, "each step frame reads its own cache")
      assert(eventScans(caches.head.relation.cachedPlan) == 1,
        "each cached step frame holds exactly one events scan")
    }
    spark.catalog.clearCache()
  }
}
