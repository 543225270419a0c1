package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{PqAdc, VectorFunctions}
import graft.operators.ProductQuantization

class ProductQuantizationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 10 clusters of 20 points in 16-d, deterministic jitter. */
  private def corpus = {
    val rows = for {
      c <- 0 until 10
      i <- 0 until 20
    } yield {
      val base = Array.tabulate(16)(j => if (j % 10 == c) 8.0f else 0.0f)
      val jit = Array.tabulate(16)(j => ((i * 31 + j * 17 + c * 7) % 16) / 16.0f - 0.5f)
      ((c * 100 + i).toLong, base.zip(jit).map { case (a, b) => a + b })
    }
    rows.toDF("vec_id", "embedding")
  }

  test("codes are in range and encoding is deterministic") {
    val df = corpus
    val model = ProductQuantization.fit(df, m = 4, k = 8)
    assert(model.subDim == 4 && model.dim == 16)
    val enc = ProductQuantization.encode(df, model)
      .as[(Long, Seq[Int])].collect()
    assert(enc.length == 200)
    assert(enc.forall(_._2.length == 4))
    assert(enc.forall(_._2.forall(c => c >= 0 && c < 8)))
    val enc2 = ProductQuantization.encode(df, model).as[(Long, Seq[Int])].collect()
    assert(enc.toSeq == enc2.toSeq)
  }

  test("pq_adc rejects out-of-range codes instead of reading garbage") {
    val codes = Seq((1L, Seq(7))).toDF("id", "pq_codes")   // k=4, code 7
    val table = (0 until 4).map(_.toFloat)
    val ex = intercept[Exception] {
      codes.select(PqAdc.pqAdc(col("pq_codes"), typedLit(table), 4)).collect()
    }
    assert(ex.getMessage.contains("outside") || ex.getCause != null)
  }

  test("pq_adc equals the manual table-lookup sum") {
    val codes = Seq((1L, Seq(1, 0, 2))).toDF("id", "pq_codes")
    // m=3 subspaces, k=4 centroids: table[j*4 + c]
    val table = (0 until 12).map(_.toFloat * 0.5f)
    val got = codes.select(
      PqAdc.pqAdc(col("pq_codes"), typedLit(table), 4).as("d"))
      .as[Double].collect().head
    // codes (1,0,2) -> table[1] + table[4] + table[10] = 0.5 + 2.0 + 5.0
    assert(math.abs(got - 7.5) < 1e-9)
  }

  test("ADC distance approximates true squared L2 on reconstructable points") {
    // corpus points sit near subspace centroids after fit, so ADC must
    // track the exact distance closely for same-cluster vs far-cluster
    val df = corpus
    val model = ProductQuantization.fit(df, m = 4, k = 16, iters = 8)
    val enc = ProductQuantization.encode(df, model)
    val q = df.filter($"vec_id" === 0L)
    val got = ProductQuantization.topK(enc, q, model, k = 199)
      .as[(Long, Long, Double, Int)].collect()
    val exact = df.filter($"vec_id" =!= 0L)
      .crossJoin(q.select($"embedding".as("qv")))
      .select($"vec_id",
        VectorFunctions.sqDist($"embedding", $"qv").as("d"))
      .as[(Long, Double)].collect().toMap
    // same-cluster candidates (ids 1..19) must rank above far clusters
    val top19 = got.take(19).map(_._2).toSet
    assert(top19.forall(_ < 100L),
      s"same-cluster ids expected in top-19, got ${got.take(19).toSeq}")
    // rank correlation sanity: ADC of the true nearest is below ADC of a far point
    val adc = got.map(r => r._2 -> r._3).toMap
    val near = (1L to 19L).map(adc).max
    val far = (900L to 919L).map(adc).min
    assert(near < far, s"ADC near=$near should be < far=$far")
    assert(exact.nonEmpty)
  }

  test("recall@10 vs exact L2 top-10 clears the floor") {
    val df = corpus
    val model = ProductQuantization.fit(df, m = 4, k = 16, iters = 8)
    val enc = ProductQuantization.encode(df, model)
    val queries = df.filter($"vec_id" % 100L === 0L)  // one per cluster
    val approx = ProductQuantization.topK(enc, queries, model, k = 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exact = Similarity.l2TopK(df, queries, 10)
    val recalls = exact.map { case (qid, ids) =>
      approx.getOrElse(qid, Set.empty).intersect(ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall@10 $mean below floor (per-query: $recalls)")
  }

  /** Exact L2 top-k per query, driver-side reference. */
  private object Similarity {
    def l2TopK(df: org.apache.spark.sql.DataFrame,
        queries: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Set[Long]] = {
      val all = df.as[(Long, Array[Float])].collect()
      val qs = queries.as[(Long, Array[Float])].collect()
      qs.map { case (qid, qv) =>
        qid -> all.filter(_._1 != qid).map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
        }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
      }.toMap
    }
  }
}
