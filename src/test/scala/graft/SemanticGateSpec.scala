package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Decontaminate
import graft.functions.MaxCosine

/** Semantic-decontamination semantics: the map-only MaxCosine gate
  * agrees with the two-column cosine path, flags exactly the rows
  * above tau, and stays a join-free plan. */
class SemanticGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))

  private val bench = vecs(
    100L -> Seq(1f, 0f, 0f, 0f),
    101L -> Seq(0f, 1f, 0f, 0f))

  private val corpus = vecs(
    1L -> Seq(1f, 0.01f, 0f, 0f),   // ~parallel to bench 100 → flagged
    2L -> Seq(0f, 0f, 1f, 0f),      // orthogonal to both → clean
    3L -> Seq(0.5f, 0.5f, 0.5f, 0.5f), // cos 0.5 vs each
    4L -> Seq(-1f, 0f, 0f, 0f))     // anti-parallel → max is vs bench 101 (0)

  test("gate flags exactly the rows with max cosine >= tau") {
    val out = Decontaminate.semanticGate(corpus, bench, tau = 0.9)
      .as[(Long, Double, Boolean)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L)) // ordered by id
    assert(byId(1L)._3 && byId(1L)._2 > 0.99)
    assert(!byId(2L)._3 && byId(2L)._2 == 0.0)
    assert(!byId(3L)._3 && byId(3L)._2 == 0.5)
    assert(!byId(4L)._3 && byId(4L)._2 == 0.0) // max over refs, not |cos|
  }

  test("MaxCosine agrees with the two-column cosine path per pair") {
    import graft.functions.VectorFunctions.cosine
    val b = Array(Array(0.3f, -0.7f, 0.2f), Array(0.9f, 0.1f, -0.4f))
    val rows = vecs(1L -> Seq(0.5f, 0.5f, 0.5f), 2L -> Seq(-0.2f, 0.8f, 0.1f))
    val viaMax = rows.select(col("vec_id"),
      MaxCosine.maxCosine(col("embedding"), b).as("m"))
      .as[(Long, Double)].collect().toMap
    val benchDf = vecs(10L -> b(0).toSeq, 11L -> b(1).toSeq)
      .select(col("embedding").as("bv"))
    val viaPairs = rows.crossJoin(benchDf)
      .groupBy("vec_id")
      .agg(max(cosine(col("embedding"), col("bv"))).as("m"))
      .as[(Long, Double)].collect().toMap
    viaMax.foreach { case (id, m) =>
      assert(math.abs(m - viaPairs(id)) < 1e-12, s"id=$id $m vs ${viaPairs(id)}")
    }
  }

  test("zero-norm corpus vector yields NaN and quarantines (fail-closed)") {
    val out = Decontaminate.semanticGate(
      vecs(1L -> Seq(0f, 0f, 0f, 0f)), bench, tau = 0.5)
      .as[(Long, Double, Boolean)].collect().head
    assert(out._2.isNaN)
    // Spark (and DuckDB) order NaN above every number, so an undefined
    // similarity FLAGS rather than silently admitting — the safe
    // direction for a contamination gate
    assert(out._3)
  }

  test("zero-norm benchmark vector is rejected at plan-build time") {
    val e = intercept[IllegalArgumentException] {
      Decontaminate.semanticGate(
        corpus, vecs(100L -> Seq(0f, 0f, 0f, 0f)), tau = 0.5)
    }
    assert(e.getMessage.contains("zero-norm"))
  }

  test("benchmark above the maxBench bound is rejected") {
    val e = intercept[IllegalArgumentException] {
      Decontaminate.semanticGate(corpus, bench, tau = 0.5, maxBench = 1)
    }
    assert(e.getMessage.contains("maxBench"))
  }

  test("the gate plan is map-only: no join, no aggregate exchange") {
    val plan = Decontaminate.semanticGate(corpus, bench, tau = 0.5)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
    assert(!plan.toLowerCase.contains("aggregate"), plan)
  }
}
