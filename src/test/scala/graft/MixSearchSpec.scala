package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Sampling, TextSearch}

/** Semantics of the mixing / batching / hybrid-retrieval additions
  * (oracle parity is covered by q82/q83/q84). */
class MixSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("temperatureMix: alpha=1 is the natural mix; alpha<1 flattens toward uniform") {
    val docs = (1 to 90).map(i => (i.toLong, "en")) ++
      (91 to 100).map(i => (i.toLong, "sw"))
    val df = docs.toDF("doc_id", "lang")

    val natural = Sampling.temperatureMix(df, Seq("lang"), alpha = 1.0)
      .select("lang", "weight", "q").as[(String, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(natural("en")._1 == 1.0 && natural("sw")._1 == 1.0)
    assert(natural("en")._2 == 0.9 && natural("sw")._2 == 0.1)

    val flat = Sampling.temperatureMix(df, Seq("lang"), alpha = 0.3)
      .select("lang", "weight", "target_n").as[(String, Double, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(flat("sw")._1 > 1.0, "tail stratum upweighted")
    assert(flat("en")._1 < 1.0, "head stratum downweighted")
    // still a distribution: targets re-spend the same corpus size
    assert(math.abs(flat("en")._2 + flat("sw")._2 - 100L) <= 1L)
    // and the head still outweighs the tail (no inversion, just flatter)
    assert(flat("en")._2 > flat("sw")._2)
  }

  test("lengthBuckets: smallest power-of-two bucket, exact padding accounting") {
    val mk = (id: Long, n: Int) => (id, (1 to n).map(i => s"w$i").mkString(" "))
    val df = Seq(mk(1, 10), mk(2, 16), mk(3, 17), mk(4, 100)).toDF("doc_id", "text")
    val rows = Chunking.lengthBuckets(df)
      .select("bucket", "n_docs", "total_tokens", "total_padding", "pad_frac")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // 10 and 16 both land in bucket 16 (edge value stays in its bucket)
    assert(rows(16L) == ((2L, 26L, 6L, 0.1875))) // pad 6+0 over 2*16
    assert(rows(32L) == ((1L, 17L, 15L, 0.4688)))
    assert(rows(128L) == ((1L, 100L, 28L, 0.2188)))
    assert(!rows.contains(64L))
  }

  test("hybridRrf: presence in both pools beats either pool alone at equal rank") {
    // doc 1: matches terms AND is the nearest vector; doc 2 lexical
    // only; vector 3 semantic only
    val docs = Seq(
      (1L, "alpha alpha beta pad1 pad2"),
      (2L, "alpha beta beta pad3 pad4"),
      (9L, "noise words only here")).toDF("doc_id", "text")
    val base = Array.fill(8)(0.0f)
    def vec(xs: (Int, Float)*) = {
      val v = base.clone(); xs.foreach { case (i, x) => v(i) = x }; v
    }
    val vecs = Seq(
      (0L, vec(0 -> 1.0f)),              // the query
      (1L, vec(0 -> 0.9f, 1 -> 0.1f)),   // close to query
      (3L, vec(0 -> 0.5f, 1 -> 0.5f)))   // further
      .toDF("vec_id", "embedding")
    val out = TextSearch.hybridRrf(docs, vecs, Seq("alpha", "beta"),
      queryVecId = 0L, topK = 10)
      .select("doc_id", "lex_rank", "sem_rank", "rrf")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._1 > 0 && out(1L)._2 > 0, "doc 1 in both pools")
    assert(out(2L)._2 == 0 && out(3L)._1 == 0)
    assert(out(1L)._3 > out(2L)._3 && out(1L)._3 > out(3L)._3,
      "fused doc must outrank single-pool docs")
    assert(!out.contains(9L) || out(9L)._1 == 0)
  }

  test("quantileKeep: exact per-group cut with deterministic ties; approx agrees on a clean fixture") {
    import graft.operators.Sampling
    // group a: scores 10..1 (10 rows); group b: 3 rows, all tied
    val rows = ((1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      Seq(("b", 1L, 5.0), ("b", 2L, 5.0), ("b", 3L, 5.0)))
      .toDF("g", "id", "score")
    val kept = Sampling.quantileKeep(rows, "score", Seq("g"), 0.5, Seq("id"))
      .select("g", "id").as[(String, Long)].collect().toSet
    // a: percent_rank <= .5 keeps the top 5 scores (pr 0..4/9; 5/9 > .5)
    assert(kept.filter(_._1 == "a").map(_._2) == Set(10L, 9L, 8L, 7L, 6L))
    // b: all scores tie — the id tie-break decides deterministically
    // (pr = 0, .5, 1 → ids 1 and 2 pass the inclusive cut)
    assert(kept.filter(_._1 == "b").map(_._2) == Set(1L, 2L))
    // keepFraction=1 keeps everything (worst row's pr is exactly 1)
    assert(Sampling.quantileKeep(rows, "score", Seq("g"), 1.0, Seq("id"))
      .count() == 13)
    // the sketch-threshold scale path: contains the exact top set and
    // overshoots by at most the threshold element's tie class
    val approx = Sampling.quantileKeepApprox(
      rows.filter($"g" === "a"), "score", Seq("g"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(Set(10L, 9L, 8L, 7L, 6L).subsetOf(approx) && approx.size <= 6)
  }

  test("weightedSample: deterministic, k rows, heavy weights dominate") {
    import graft.operators.Sampling
    // 100 light rows (w=1) + 10 heavy rows (w=1000)
    val rows = ((1L to 100L).map(i => (i, 1.0)) ++
      (1001L to 1010L).map(i => (i, 1000.0))).toDF("id", "w")
    val s1 = Sampling.weightedSample(rows, "w", 20, "id")
      .select("id").as[Long].collect().toSeq
    val s2 = Sampling.weightedSample(rows, "w", 20, "id")
      .select("id").as[Long].collect().toSeq
    assert(s1 == s2 && s1.size == 20)            // reproducible, exact k
    assert(s1.distinct.size == 20)               // without replacement
    // u^(1/1000) ≈ 1 for any u — every heavy row must survive a k=20
    // cut over 110 rows; light rows fill the rest
    assert((1001L to 1010L).forall(s1.contains))
    // uniform weights reduce to pure md5-order sampling (w=1 → key=u)
    val uni = Sampling.weightedSample(rows.withColumn("w", lit(1.0)), "w", 5, "id")
      .select("id").as[Long].collect().toSeq
    assert(uni.size == 5 && uni.distinct.size == 5)
  }
}
