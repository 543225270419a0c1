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
}
