package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CorpusFilters, ScalarQuantization, Similarity}

/** SQ8 grid-snap bounds + retrieval agreement, and the encoding
  * audit on planted mojibake. */
class Sq8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = {
    // 20 vectors in 4-dim with distinct directions
    val rows = (0 until 20).map { i =>
      (i.toLong, Array(
        math.sin(i * 0.37).toFloat, math.cos(i * 0.53).toFloat,
        (i % 7 / 7.0).toFloat, ((i * 13 % 11) / 11.0).toFloat), i % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("dequantized values stay within half a grid step") {
    val (mins, maxs) = ScalarQuantization.fitMinMax(emb)
    val deq = emb.select(col("embedding"),
      ScalarQuantization.dequantize(col("embedding"), mins, maxs)
        .as("deq")).collect()
    deq.foreach { r =>
      val orig = r.getSeq[Float](0)
      val snapped = r.getSeq[Double](1)
      orig.indices.foreach { d =>
        val step = (maxs(d) - mins(d)) / 255.0
        assert(math.abs(orig(d) - snapped(d)) <= step / 2 + 1e-12,
          s"dim $d snap error exceeds half step")
        assert(snapped(d) >= mins(d) - 1e-12 &&
          snapped(d) <= maxs(d) + 1e-12, "snap stays on the grid")
      }
    }
  }

  test("sq8 retrieval agrees with brute force on separated vectors") {
    val q = emb.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(emb, q, k = 3)
      .withColumn("rank", col("rank").cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1))
      .toMap
    val sq8 = ScalarQuantization.sq8TopK(emb, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1))
      .toMap
    // top-1 must match; overall overlap >= 2/3 per query
    for (qi <- 0L until 3L)
      assert(sq8((qi, 1L)) == exact((qi, 1L)), s"top-1 of query $qi")
    val overlap = (0L until 3L).map { qi =>
      val e = (1L to 3L).map(r => exact((qi, r))).toSet
      val s = (1L to 3L).map(r => sq8((qi, r))).toSet
      (e intersect s).size
    }
    assert(overlap.forall(_ >= 2), s"overlap $overlap")
  }

  test("encoding audit counts planted mojibake") {
    val d = Seq(
      (1L, "s", "clean ascii text."),
      (2L, "s", "bad bytes � here"),
      (3L, "s", "ctrl\u0001char"),
      (4L, "t", "héllo wörld"))
      .toDF("doc_id", "source", "text")
    val r = CorpusFilters.encodingAudit(d)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("s").getLong(2) == 1L, "replacement char doc")
    assert(r("s").getLong(3) == 1L, "control char doc")
    // "héllo wörld": 2 non-ascii of 11 chars
    assert(math.abs(r("t").getDouble(4) - 2.0 / 11.0) < 1e-6)
  }
}
