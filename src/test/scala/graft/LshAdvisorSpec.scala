package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Attribution, LshAdvisor}

/** S-curve arithmetic + planted-journey attribution semantics. */
class LshAdvisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lsh advisor: curve math, budget cover, and a sane winner") {
    // disjoint-token docs: background similarity is exactly 0
    val docs = (0L until 50L).map(i =>
      (i, (0 until 20).map(t => s"w${i}_$t").mkString(" ")))
      .toDF("doc_id", "text")
    val r = LshAdvisor.advise(docs, dupThreshold = 0.8,
      signatureBudget = 128, probeIds = 50, buckets = 5).collect()
    assert(r.map(_.getLong(1)).toSeq ==
      Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L))
    r.foreach { row =>
      assert(row.getLong(0) * row.getLong(1) == 128L, "budget covered")
      assert(row.getDouble(2) == 0.0, "disjoint docs: bg = 0")
      assert(row.getDouble(4) == 0.0, "bg 0 -> false prob 0")
      // closed-form check: catch = 1 - (1 - 0.8^r)^b
      val expect = 1.0 - math.pow(
        1.0 - math.pow(0.8, row.getLong(1).toDouble),
        row.getLong(0).toDouble)
      assert(math.abs(row.getDouble(3) -
        math.rint(expect * 1e6) / 1e6) < 1e-9)
    }
    // with bg = 0 separation = catch, maximized at r = 1 (catch ~ 1)
    val best = r.filter(_.getBoolean(7))
    assert(best.length == 1 && best(0).getLong(1) == 1L)
  }

  test("brier: decomposition identity and the calibrated-vs-sharp split") {
    import graft.operators.QualityModel
    // perfectly calibrated but useless: every forecast = base rate
    val flat = (0 until 100).map(i => (0.5, i % 2 == 0))
      .toDF("p", "y")
    val f = QualityModel.brierDecomposition(flat, "p", "y").collect()(0)
    assert(f.getDouble(2) == 0.0, "reliability 0 (calibrated)")
    assert(f.getDouble(3) == 0.0, "resolution 0 (useless)")
    assert(f.getDouble(4) == 0.25, "uncertainty = 0.5*0.5")
    assert(f.getDouble(5) == 0.25, "identity")
    // sharp and right: p in {0.05, 0.95} matching labels
    val sharp = (0 until 100).map(i =>
      (if (i % 2 == 0) 0.95 else 0.05, i % 2 == 0)).toDF("p", "y")
    val s = QualityModel.brierDecomposition(sharp, "p", "y").collect()(0)
    assert(s.getDouble(3) == 0.25, "full resolution")
    assert(s.getDouble(5) < 0.01, "binned brier near 0")
    assert(math.abs(s.getDouble(5) -
      (s.getDouble(2) - s.getDouble(3) + s.getDouble(4))) < 1e-9)
  }

  test("effective data: fresh tokens pass through, repeats decay") {
    import graft.operators.Curation
    val alloc = Seq(
      ("fresh", 1000L, 800.0),    // under 1 epoch: D' = alloc
      ("twice", 1000L, 2000.0),   // 2 epochs: R=1
      ("heavy", 100L, 10000.0))   // 100 epochs: D' -> U*(1+R*)
      .toDF("stratum", "avail_tokens", "alloc_tokens")
    val r = Curation.effectiveData(alloc).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("fresh").getDouble(4) == 800.0)
    assert(r("fresh").getDouble(5) == 1.0)
    // 2 epochs: 1000*(1+15.39*(1-e^{-1/15.39})) ~ 1967 < 2000
    val tw = r("twice").getDouble(4)
    assert(tw > 1900 && tw < 2000, s"twice=$tw")
    // 100 epochs saturates near U*(1+R*) = 1639 << 10000 allocated
    val hv = r("heavy").getDouble(4)
    assert(hv < 1700 && hv > 1500, s"heavy=$hv")
    assert(r("heavy").getDouble(5) < 0.2, "repetition efficiency collapses")
  }

  test("touch attribution: planted journeys split credit correctly") {
    def ts(m: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-01 09:$m%02d:00")
    val ev = Seq(
      // user 1: view -> click -> purchase (then post-hoc view ignored)
      (1L, ts(1), 1L, "view", 0.0, "{}"),
      (2L, ts(2), 1L, "click", 0.0, "{}"),
      (3L, ts(3), 1L, "purchase", 9.0, "{}"),
      (4L, ts(4), 1L, "view", 0.0, "{}"),
      // user 2: click only then purchase
      (5L, ts(1), 2L, "click", 0.0, "{}"),
      (6L, ts(2), 2L, "purchase", 5.0, "{}"),
      // user 3: never purchases -> no credit
      (7L, ts(1), 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Attribution.touchComparison(ev).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("view", "click"))
    // first touch: user1 -> view, user2 -> click
    assert(r("view").getDouble(2) == 1.0)
    assert(r("click").getDouble(2) == 1.0)
    // last touch: user1 -> click, user2 -> click
    assert(r("view").getDouble(3) == 0.0)
    assert(r("click").getDouble(3) == 2.0)
    // linear: user1 0.5/0.5, user2 click 1.0
    assert(r("view").getDouble(4) == 0.5)
    assert(r("click").getDouble(4) == 1.5)
  }
}
