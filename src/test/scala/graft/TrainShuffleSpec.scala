package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainShuffle

/** Determinism and structure of the seeded training shuffle: the
  * permutation is a pure function of (id, seed) — independent of
  * partitioning — positions are dense 1..n per shard, and changing
  * the seed changes the order. */
class TrainShuffleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ids = (0L until 64L).toDF("doc_id")

  test("shard assignment matches the closed-form hash") {
    TrainShuffle.shuffleShards(ids, nShards = 4, seed = 7L).collect()
      .foreach { r =>
        val h = ((r.getLong(0) + 7L) % 1000000007L) * 2654435761L % 1000000007L
        assert(r.getInt(1) == (h % 4).toInt)
      }
  }

  test("huge ids: no Long overflow, shards stay in [0, nShards)") {
    // (id + seed) * KNUTH would overflow Long for id >= ~3.5e9; the
    // mod-first form must keep the closed form exact and non-negative
    val huge = Seq(3500000000L, 9200000000000000000L, 9007199254740993L)
      .toDF("doc_id")
    val rows = TrainShuffle.shuffleShards(huge, nShards = 4, seed = 7L)
      .collect()
    rows.foreach { r =>
      val expect = java.math.BigInteger.valueOf(r.getLong(0))
        .add(java.math.BigInteger.valueOf(7L))
        .mod(java.math.BigInteger.valueOf(1000000007L))
        .multiply(java.math.BigInteger.valueOf(2654435761L))
        .mod(java.math.BigInteger.valueOf(1000000007L))
        .mod(java.math.BigInteger.valueOf(4L)).intValueExact()
      assert(r.getInt(1) == expect && r.getInt(1) >= 0 && r.getInt(1) < 4)
    }
  }

  test("positions are dense 1..n within each shard") {
    val byShard = TrainShuffle.shuffleShards(ids, nShards = 4, seed = 7L)
      .collect().groupBy(_.getInt(1))
    assert(byShard.keySet.nonEmpty)
    byShard.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("order is independent of input partitioning") {
    val a = TrainShuffle.shuffleShards(ids, 4, 7L)
      .orderBy("shard", "pos").collect().toSeq
    val b = TrainShuffle.shuffleShards(ids.repartition(13), 4, 7L)
      .orderBy("shard", "pos").collect().toSeq
    assert(a == b)
  }

  test("the permutation actually shuffles and the seed changes it") {
    // orderBy pos (not bare select): projecting doc_id alone would let
    // Catalyst prune the unused window and return input order
    val s7 = TrainShuffle.shuffleShards(ids, 1, 7L)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val s8 = TrainShuffle.shuffleShards(ids, 1, 8L)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    assert(s7 != (0L until 64L).toSeq, "hash order must not be identity")
    assert(s7 != s8, "different seed, different order")
    assert(s7.sorted == s8.sorted, "both are permutations of the same ids")
  }
}
