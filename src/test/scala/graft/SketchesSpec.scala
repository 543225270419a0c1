package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (0 until 200).map { i =>
    // "alpha" in every doc, "beta" in every 4th, "gamma" in every 20th
    val parts = Seq("alpha") ++
      (if (i % 4 == 0) Seq("beta") else Seq.empty) ++
      (if (i % 20 == 0) Seq("gamma") else Seq.empty) ++
      Seq(s"filler$i", s"noise${i % 7}")
    (i.toLong, parts.mkString(" "))
  }.toDF("doc_id", "text")

  test("CMS estimates obey the one-sided eps·N error bound") {
    val got = Sketches.cmsTokenCounts(docs,
      Seq("alpha", "beta", "gamma", "never_present"), eps = 0.001)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val n = got("alpha")._2.toDouble
    val exact = Map("alpha" -> 200L, "beta" -> 50L, "gamma" -> 10L,
      "never_present" -> 0L)
    exact.foreach { case (term, ex) =>
      val est = got(term)._1
      assert(est >= ex, s"$term: CMS must never underestimate ($est < $ex)")
      assert(est <= ex + (0.001 * n).ceil.toLong + 1,
        s"$term: overestimate $est beyond eps*N bound of $ex")
    }
  }

  test("deterministic for a fixed seed") {
    val a = Sketches.cmsTokenCounts(docs, Seq("alpha", "beta")).collect().toSeq
    val b = Sketches.cmsTokenCounts(docs, Seq("alpha", "beta")).collect().toSeq
    assert(a == b)
  }

  test("total count equals the token multiset size") {
    val total = Sketches.cmsTokenCounts(docs, Seq("alpha"))
      .select("n_tokens").as[Long].head()
    val exact = docs.select(explode(split(trim(col("text")), "\\s+")))
      .count()
    assert(total == exact)
  }

  test("overlap matrix: HLL inclusion-exclusion tracks exact overlap") {
    // slice A = keys 1..200, slice B = 101..300, slice C = 1000..1009
    // exact: |A ∩ B| = 100, |A ∩ C| = 0, |B ∩ C| = 0
    val rows =
      (1 to 200).map(k => ("a", k.toLong)) ++
      (101 to 300).map(k => ("b", k.toLong)) ++
      (1000 to 1009).map(k => ("c", k.toLong))
    val df = rows.toDF("slice", "key")
    val m = Sketches.overlapMatrix(df, "slice", "key").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("est_overlap"), r.getAs[Double]("est_union")))
      .toMap
    assert(m.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (abOverlap, abUnion) = m(("a", "b"))
    // rsd at lgK=14 is ~0.8%; allow 5% on these small sets
    assert(math.abs(abOverlap - 100.0) <= 15.0, s"a∩b est $abOverlap")
    assert(math.abs(abUnion - 300.0) <= 15.0, s"a∪b est $abUnion")
    assert(m(("a", "c"))._1 <= 5.0 && m(("b", "c"))._1 <= 5.0,
      "disjoint slices must estimate ~zero overlap")
  }

  test("overlap matrix: deterministic and pair-ordered") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 2L), ("y", 3L))
      .toDF("slice", "key")
    val a = Sketches.overlapMatrix(df, "slice", "key").collect().toSeq
    val b = Sketches.overlapMatrix(df, "slice", "key").collect().toSeq
    assert(a == b)
    assert(a.map(r => (r.getString(0), r.getString(1))) == Seq(("x", "y")))
    // jaccard = overlap/union stays in [0, 1]
    val j = a.head.getAs[Double]("jaccard_est")
    assert(j >= 0.0 && j <= 1.0)
  }
}
