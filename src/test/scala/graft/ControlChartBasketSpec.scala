package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, Basket, CorpusFilters}
import graft.quality.Correlation

/** EWMA chart recursion, Kendall τ-b, basket affinity, and the
  * line-dedup / soft-dedup corpus audits on planted fixtures. */
class ControlChartBasketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ewma closed form equals the direct recursion") {
    val xs = Seq(10.0, 12.0, 9.0, 50.0, 11.0, 10.5)
    val daily = xs.zipWithIndex
      .map { case (x, i) => (java.sql.Date.valueOf(f"2024-06-${i + 1}%02d"), x) }
      .toDF("d", "x")
    val got = Anomaly.ewmaFromDaily(daily, lambda = 0.2).collect()
    val mu = xs.sum / xs.size
    var z = mu
    xs.zip(got).foreach { case (x, row) =>
      z = 0.2 * x + 0.8 * z
      assert(math.abs(row.getDouble(2) - z) < 1e-6,
        s"ewma at ${row.getDate(0)}")
    }
    // limits widen monotonically toward the asymptote
    val halves = got.map(r => r.getDouble(3) - r.getDouble(4))
    assert(halves.zip(halves.tail).forall { case (a, b) => b >= a - 1e-12 })
  }

  test("ewma alarms on a sustained shift but not a lone spike") {
    def mk(xs: Seq[Double]) = xs.zipWithIndex
      .map { case (x, i) => (java.sql.Date.valueOf(f"2024-06-${i + 1}%02d"), x) }
      .toDF("d", "x")
    // lone spike in a flat series: damped, no alarm after the spike day
    val spike = Anomaly.ewmaFromDaily(
      mk(Seq(10, 10, 10, 10, 40, 10, 10, 10, 10, 10).map(_.toDouble)),
      lambda = 0.3).collect()
    assert(!spike.last.getBoolean(5), "flat tail must not alarm")
    // short sustained shift at the end of a long baseline (a 50/50
    // split can never alarm: the Phase-I mean sits mid-shift and
    // |z−μ|/σ stays below the asymptotic limit by construction)
    val shift = Anomaly.ewmaFromDaily(
      mk((Seq.fill(20)(10.0) ++ Seq.fill(3)(50.0))),
      lambda = 0.3).collect()
    assert(shift.last.getBoolean(5), "sustained end shift must alarm")
  }

  test("kendall tau-b: perfect agreement, reversal, and ties") {
    def m(rows: (String, Double, Double)*) = rows.toDF("k", "x", "y")
    val agree = Correlation.kendallTau(
      m(("a", 1, 1), ("b", 2, 2), ("c", 3, 3))).collect().head
    assert(agree.getDouble(5) == 1.0)
    val rev = Correlation.kendallTau(
      m(("a", 1, 3), ("b", 2, 2), ("c", 3, 1))).collect().head
    assert(rev.getDouble(5) == -1.0)
    // one tie in x: n0=3, n1=1 → τ_b = (2-0)/sqrt(2*3)
    val tied = Correlation.kendallTau(
      m(("a", 1, 1), ("b", 1, 2), ("c", 3, 3))).collect().head
    assert(math.abs(tied.getDouble(5) - 2.0 / math.sqrt(6.0)) < 1e-6)
  }

  test("basket affinity: planted pair dominates lift and AA weights") {
    // parts 1,2 always together (4 orders of size 2); part 3 everywhere
    val rows =
      (1 to 4).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L))) ++
      (5 to 12).map(o => (o.toLong, 3L)) ++
      Seq((5L, 4L), (6L, 4L), (7L, 4L))
    val li = rows.toDF("l_orderkey", "l_partkey")
    val r = Basket.partAffinity(li, minBoth = 3L, topK = 10).collect()
    val top = r.head
    assert((top.getLong(0), top.getLong(1)) == ((1L, 2L)))
    // lift = n_both*N/(n_a*n_b) = 4*12/(4*4) = 3
    assert(math.abs(top.getDouble(7) - 3.0) < 1e-6)
    // AA: 4 shared orders of size 2 → 4/ln(2)
    assert(math.abs(top.getDouble(8) - 4.0 / math.log(2.0)) < 1e-6)
    // pair (3,4): 3 shared orders of size 2, lift = 3*12/(8*3) = 1.5
    val p34 = r.find(x => x.getLong(0) == 3L && x.getLong(1) == 4L).get
    assert(math.abs(p34.getDouble(7) - 1.5) < 1e-6)
  }

  test("line dedup flags the cross-doc banner and spares unique lines") {
    val banner = "Subscribe to our newsletter."
    val d = Seq(
      (1L, "s", s"$banner\nunique one."),
      (2L, "s", s"$banner\nunique two longer line."),
      (3L, "s", s"  $banner  \nunique three."),
      (4L, "t", "all original here.\nnothing repeats."))
      .toDF("doc_id", "source", "text")
    val r = CorpusFilters.lineDedup(d, minDocs = 3)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("s").getLong(1) == 6L, "6 non-empty lines in s")
    assert(r("s").getLong(2) == 3L, "the banner occurrences only")
    assert(r("t").getLong(2) == 0L)
    // char share counts trimmed banner chars
    val expShare = 3.0 * banner.length /
      (3 * banner.length + "unique one.".length +
        "unique two longer line.".length + "unique three.".length)
    assert(math.abs(r("s").getDouble(5) - expShare) < 1e-4)
  }

  test("soft dedup: cluster of c copies carries unit mass") {
    val d = Seq(
      (1L, "s", "Same Text  here"), (2L, "s", "same text here"),
      (3L, "s", " SAME   TEXT HERE "), (4L, "s", "distinct"),
      (5L, "t", "other"))
      .toDF("doc_id", "source", "text")
    val r = CorpusFilters.softDedupWeights(d)
      .collect().map(x => x.getString(0) -> x).toMap
    // s: cluster of 3 (normalized-equal) + 1 unique → mass 1+1 = 2
    assert(math.abs(r("s").getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(r("s").getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(r("t").getDouble(2) - 1.0) < 1e-9)
  }
}
