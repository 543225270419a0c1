package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Token-budget planning semantics: normalization, epoch math, the
  * oversubscription cap, and zero-weight strata. */
class TokenBudgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    ("en", "one two three four"),    // 4 tokens
    ("en", "five six"),              // 2
    ("de", "eins zwei"),             // 2
    ("xx", "a b c"),                 // 3, not in the mixture
    ("de", "   "))                   // whitespace-only → 0 tokens
    .toDF("lang", "text")

  private def plan(budget: Long, w: Map[String, Double],
      maxEpochs: Double = 4.0) =
    Curation.tokenBudgetPlan(docs, budget, w, maxEpochs = maxEpochs)
      .as[(String, Long, Double, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap

  test("epoch math and availability per stratum") {
    val p = plan(60L, Map("en" -> 0.5, "de" -> 0.5))
    assert(p("en")._2 == 6L)            // avail
    assert(p("en")._4 == 30L)           // target
    assert(p("en")._5 == 5.0)           // epochs 30/6
    assert(p("en")._6)                  // over the 4.0 cap
    assert(p("de")._2 == 2L)
    assert(p("de")._5 == 15.0 && p("de")._6)
  }

  test("ratio weights normalize: 2:2 equals 0.5:0.5") {
    val a = plan(60L, Map("en" -> 2.0, "de" -> 2.0))
    val b = plan(60L, Map("en" -> 0.5, "de" -> 0.5))
    assert(a == b)
  }

  test("strata outside the mixture report weight 0, never flagged") {
    val p = plan(60L, Map("en" -> 1.0))
    assert(p("xx")._3 == 0.0 && p("xx")._4 == 0L && !p("xx")._6)
    assert(p("de")._3 == 0.0)
  }

  test("a feasible budget leaves every stratum under the cap") {
    val p = plan(8L, Map("en" -> 0.75, "de" -> 0.25))
    assert(p("en")._5 == 1.0 && !p("en")._6)
    assert(p("de")._5 == 1.0 && !p("de")._6)
  }

  test("invalid inputs are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Curation.tokenBudgetPlan(docs, 0L, Map("en" -> 1.0)) }
    intercept[IllegalArgumentException] {
      Curation.tokenBudgetPlan(docs, 10L, Map.empty) }
    intercept[IllegalArgumentException] {
      Curation.tokenBudgetPlan(docs, 10L, Map("en" -> 0.0)) }
  }
}
