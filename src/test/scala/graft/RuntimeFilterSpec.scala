package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RuntimeFilter
import graft.functions.BloomKeyMightContain

/** The Bloom runtime filter's contract: zero false negatives (the
  * reduced join equals the plain join exactly), real reduction on the
  * probe side, and a codegen-path probe identical to the interpreted
  * one. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val big = (0L until 10000L).map(i => (i, i % 7)).toDF("k", "v")
  private lazy val small = Seq(3L, 5000L, 9999L, 123L).toDF("sk")

  test("reduced join result is exactly the plain join result") {
    val reduced = RuntimeFilter.bloomReducedJoin(big, "k", small, "sk")
      .select("k").as[Long].collect().sorted.toSeq
    val plain = big.join(small, $"k" === $"sk")
      .select("k").as[Long].collect().sorted.toSeq
    assert(reduced == plain && plain == Seq(3L, 123L, 5000L, 9999L))
  }

  test("no false negatives: every true key survives the prefilter") {
    val kept = RuntimeFilter.bloomFiltered(big, "k", small, "sk")
      .select("k").as[Long].collect().toSet
    assert(Set(3L, 123L, 5000L, 9999L).subsetOf(kept))
  }

  test("prefilter actually reduces the probe side near the fpp bound") {
    val kept = RuntimeFilter.bloomFiltered(big, "k", small, "sk", fpp = 0.01)
      .count()
    // 4 true + ~1% of 9996 false positives; 10x headroom on the bound
    assert(kept < 4 + 1000, s"kept $kept of 10000 — bloom not filtering")
  }

  test("probe handles integer-typed keys and null keys") {
    val bigInt = Seq(Some(1), Some(2), None).toDF("k")
    val kept = RuntimeFilter.bloomFiltered(bigInt, "k", Seq(2L).toDF("sk"), "sk")
      .select("k").as[Option[Int]].collect().toSeq
    assert(kept == Seq(Some(2)), "null keys cannot match and must drop")
  }

  test("reduced join resolves when both key columns share a name") {
    val bigSame = big.withColumnRenamed("k", "user_id")
    val smallSame = small.withColumnRenamed("sk", "user_id")
    val n = RuntimeFilter.bloomReducedJoin(
      bigSame, "user_id", smallSame, "user_id").count()
    assert(n == 4L)
  }

  test("empty build side short-circuits to an empty (not null-bloom) result") {
    val empty = Seq.empty[Long].toDF("sk")
    assert(RuntimeFilter.bloomReducedJoin(big, "k", empty, "sk").count() == 0L)
  }

  test("interpreted eval agrees with codegen") {
    val bloom = small.stat.bloomFilter("sk", 4, 0.01)
    val c = BloomKeyMightContain(col("k"), bloom)
    val viaExpr = big.filter(c).select("k").as[Long].collect().toSet
    val interpreted = (0L until 10000L).filter(bloom.mightContainLong).toSet
    assert(viaExpr == interpreted)
  }
}
