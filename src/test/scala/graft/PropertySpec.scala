package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.apache.spark.sql.functions._
import graft.lake.MergeWriter
import graft.operators.Sessionize

/** Property tests (SURVEY §5): invariants over generated inputs rather
  * than fixed fixtures. Spark actions are expensive, so properties run
  * with a reduced case count but unconstrained generators. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(12)

  private def assertProp(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("upsert: idempotent, keys unique, updates always win") {
    val rowGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 3L), Gen.chooseNum(0, 999)))
    assertProp(Prop.forAll(rowGen, rowGen) { (t, u) =>
      // de-dup generated keys inside each side (upsert's contract)
      val target = t.distinctBy(r => (r._1, r._2))
        .toDF("store_id", "dt", "v")
      val updates = u.distinctBy(r => (r._1, r._2))
        .toDF("store_id", "dt", "v")
      val once = MergeWriter.upsert(target, updates, Seq("store_id", "dt"))
      val twice = MergeWriter.upsert(once, updates, Seq("store_id", "dt"))
      val rows = once.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val updMap = updates.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val keysUnique = once.groupBy("store_id", "dt").count()
        .filter(col("count") > 1).isEmpty
      val updatesWin = updMap.forall { case (k, v) => rows.get(k).contains(v) }
      val idempotent = twice.except(once).isEmpty && once.except(twice).isEmpty
      keysUnique && updatesWin && idempotent
    })
  }

  test("sessionize: event counts are conserved and durations bounded") {
    val evGen = Gen.listOfN(25, Gen.zip(
      Gen.chooseNum(1L, 3L),                       // user
      Gen.chooseNum(0L, 4L * 3600L),               // offset seconds
      Gen.chooseNum(0, 100)))                      // value
    assertProp(Prop.forAll(evGen) { evs =>
      val df = evs.zipWithIndex.map { case ((u, off, v), i) =>
        (u, new java.sql.Timestamp(1704067200000L + off * 1000L + i), v.toDouble)
      }.toDF("user_id", "ts", "value")
      val stats = Sessionize.sessionStats(df, "user_id", "ts", 1800L, "value")
        .collect()
      val conserved = stats.map(_.getLong(2)).sum == evs.length
      // a session's span is < gap * events (each gap within a session ≤ gapSeconds)
      val bounded = stats.forall(r =>
        r.getLong(3) <= 1800L * 1000000L * r.getLong(2))
      conserved && bounded
    })
  }

  test("fillna leaves no nulls on filled columns") {
    val g = Gen.listOfN(10, Gen.option(Gen.chooseNum(0, 100)))
    assertProp(Prop.forAll(g) { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x.map(_.toDouble)) }
        .toDF("id", "v")
        .na.fill(0.0, Seq("v"))
      df.filter(col("v").isNull).isEmpty
    })
  }
}
