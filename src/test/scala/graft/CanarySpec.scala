package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Canary

/** Provenance-canary contract: inject→detect round-trips at 100%, a
  * clean corpus reads zero, a truncated copy still trips the near
  * tier, and the wrong seed finds nothing. */
class CanarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus() = (0 until 30).map(i =>
    (i.toLong, (0 until 20).map(j => s"w${i}_$j").mkString(" ")))
    .toDF("doc_id", "text")

  test("inject appends n canaries above max id; round-trip detects all") {
    val injected = Canary.inject(corpus(), seed = 7L, n = 8)
    assert(injected.count() == 38L)
    assert(injected.agg(max("doc_id")).head.getLong(0) == 37L)
    val r = Canary.detect(injected, seed = 7L, n = 8).collect()(0)
    assert(r.getAs[Long]("n_planted") == 8L)
    assert(r.getAs[Long]("n_exact") == 8L)
    assert(r.getAs[Long]("n_near") == 8L)
    assert(r.getAs[Double]("detection_rate") == 1.0)
  }

  test("clean corpus: zero detections") {
    val r = Canary.detect(corpus(), seed = 7L, n = 8).collect()(0)
    assert(r.getAs[Long]("n_exact") == 0L)
    assert(r.getAs[Long]("n_near") == 0L)
    assert(r.getAs[Double]("detection_rate") == 0.0)
  }

  test("a truncated copy loses exact but keeps near detection") {
    val injected = Canary.inject(corpus(), seed = 7L, n = 8)
    // derived dataset: keep only the first 10 tokens of every doc
    val truncated = injected.withColumn("text",
      array_join(slice(split(col("text"), " "), 1, 10), " "))
    val r = Canary.detect(truncated, seed = 7L, n = 8).collect()(0)
    assert(r.getAs[Long]("n_exact") == 0L, "truncation must break md5")
    assert(r.getAs[Long]("n_near") == 8L,
      "10 surviving tokens still carry >= 3 shared 5-grams")
  }

  test("the wrong seed finds nothing") {
    val injected = Canary.inject(corpus(), seed = 7L, n = 8)
    val r = Canary.detect(injected, seed = 8L, n = 8).collect()(0)
    assert(r.getAs[Long]("n_near") == 0L)
  }

  test("canary text generation is deterministic per (seed, n)") {
    assert(Canary.canaryTexts(3L, 4) == Canary.canaryTexts(3L, 4))
    assert(Canary.canaryTexts(3L, 4) != Canary.canaryTexts(4L, 4))
  }
}
