package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DupClusters, Sampling}

/** The cluster-aware corpus-assembly tier: quality-aware
  * canonicalization, leakage-proof cluster splits, and token-budget
  * fill — the three selection policies that turn dedup clusters and
  * doc stats into a training corpus.
  */
class CorpusAssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Three clusters by construction: {1,2,3} share a prefix chain,
  // {10,11} share a suffix, {20} is a singleton.
  private lazy val docs = Seq(
    (1L, "aaaa-shared-prefix tail one", 10L),
    (2L, "aaaa-shared-prefix tail two", 30L),
    (3L, "aaaa-shared-prefix tail three", 30L),
    (10L, "left part zzzz-shared-suffix", 7L),
    (11L, "other text zzzz-shared-suffix", 9L),
    (20L, "entirely unique document", 5L)
  ).toDF("doc_id", "text", "score")

  private lazy val clusters =
    DupClusters.clusterDocuments(docs, DupClusters.affixPairs(docs, n = 18))

  test("canonicalize keeps the highest score, ties to the lowest id") {
    val kept = DupClusters.canonicalize(docs, clusters, "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cluster {1,2,3}: scores 10/30/30 — tie between 2 and 3 goes to 2
    // cluster {10,11}: 11 wins on score; singleton 20 survives as-is
    assert(kept.toSeq === Seq(
      (2L, 1L, 3L, 30L), (11L, 10L, 2L, 9L), (20L, 20L, 1L, 5L)))
  }

  test("canonicalize emits exactly one survivor per cluster") {
    val kept = DupClusters.canonicalize(docs, clusters, "score")
    assert(kept.count() ===
      clusters.select("cluster_id").distinct().count())
    assert(kept.select("cluster_id").distinct().count() === kept.count())
  }

  test("clusterSplit never lets a cluster straddle splits, and matches " +
    "hashSplit of the cluster id") {
    val splits = Seq(("train", 0.6), ("val", 0.2), ("test", 0.2))
    val out = Sampling.clusterSplit(docs, clusters, splits)
    // one split value per cluster
    val perCluster = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).collect()
    assert(perCluster.forall(_.getLong(1) == 1L))
    // and the value IS hashSplit applied to the cluster id
    val expected = Sampling.hashSplit(
      clusters.select("cluster_id").distinct(), splits, "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.collect().foreach { r =>
      assert(r.getString(2) === expected(r.getLong(1)))
    }
  }

  test("budgetFill keeps the maximal md5-order prefix within budget") {
    val df = Seq(
      (1L, "s0", 40L), (2L, "s0", 40L), (3L, "s0", 40L), (4L, "s0", 40L),
      (5L, "s1", 100L), (6L, "s1", 100L)
    ).toDF("doc_id", "source", "n_chars")
    val out = Sampling.budgetFill(df, Seq("source"), "n_chars",
      budget = 100L, overrides = Map("s1" -> 150L))
    val bySrc = out.collect().groupBy(_.getString(1))
    // s0: 40-char docs, budget 100 → exactly 2 fit (cum 40, 80; 120 crosses)
    assert(bySrc("s0").length === 2)
    assert(bySrc("s0").map(_.getLong(3)).max === 80L)
    // s1 override 150: one 100-char doc fits, the second crosses at 200
    assert(bySrc("s1").length === 1)
    assert(bySrc("s1").head.getLong(3) === 100L)
  }

  test("budgetFill is prefix-stable: a crossing doc is not skipped over") {
    // one huge doc early in md5 order must TERMINATE its stratum's
    // fill, not be stepped around in favor of later small docs
    val df = (1L to 20L).map(i =>
      (i, "s", if (i == 7L) 1000L else 10L)).toDF("doc_id", "source", "n_chars")
    val out = Sampling.budgetFill(df, Seq("source"), "n_chars", budget = 200L)
      .collect()
    val md5Order = (1L to 20L).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
    val hugeAt = md5Order.indexOf(7L)
    // everything kept must precede the huge doc in md5 order
    val keptIds = out.map(_.getLong(0)).toSet
    assert(!keptIds.contains(7L))
    assert(keptIds.forall(id => md5Order.indexOf(id) < hugeAt))
    // and the kept set is exactly that maximal prefix
    assert(keptIds === md5Order.take(hugeAt).toSet)
    if (hugeAt > 0) assert(out.map(_.getLong(3)).max === hugeAt * 10L)
  }

  test("calibration bins scores against observed positives, hand-computed") {
    val df = Seq(
      (0.05, true), (0.05, false),           // bin 1: avg .05, frac .5
      (0.95, true), (0.97, true), (1.0, true) // 1.0 folds into bin 10
    ).toDF("score", "label")
    val out = graft.operators.QualityModel
      .calibration(df, "score", "label", nBins = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1, 2L, 0.05, 0.5),
      (10, 3L, math.rint((0.95 + 0.97 + 1.0) / 3 * 1e6) / 1e6, 1.0)))
  }

  test("splitStraddleAudit counts boundary-crossing pairs; clusterSplit " +
    "drives them to zero") {
    val splits = Seq(("train", 0.5), ("test", 0.5))
    val pairs = DupClusters.affixPairs(docs, n = 18)
    // hand-built per-doc assignment that forces a straddle: put doc 1
    // train and doc 2 test — pair (1,2) must be counted
    val forced = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (10L, "train"), (11L, "train"), (20L, "test")).toDF("doc_id", "split")
    val audit = Sampling.splitStraddleAudit(pairs, forced).collect()(0)
    assert(audit.getLong(0) === pairs.count())
    assert(audit.getLong(1) >= 1L)   // (1,2) straddles by construction
    // cluster-keyed assignment: zero straddles whatever the hash does
    val byCluster = Sampling.clusterSplit(docs, clusters, splits)
    val clean = Sampling.splitStraddleAudit(pairs, byCluster).collect()(0)
    assert(clean.getLong(1) === 0L)
    assert(clean.getDouble(2) === 0.0)
  }

  test("budgetFill determinism: identical output across runs") {
    val df = docs.withColumnRenamed("score", "n_chars")
    def run() = Sampling.budgetFill(df, Seq("text"), "n_chars", budget = 50L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run() === run())
  }
}
