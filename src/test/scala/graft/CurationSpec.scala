package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Sampling}

/** Stratified sampling + chunking: the deterministic curation
  * primitives (quota draws reproducible across engines, windows with
  * exact boundary semantics). */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (0 until 60).map { i =>
    (i.toLong, s"lang_${i % 2}", s"src_${i % 3}", s"doc number $i body")
  }.toDF("doc_id", "lang", "source", "text")

  test("stratifiedN takes exactly n per stratum, ranks 1..n") {
    val got = Sampling.stratifiedN(docs, Seq("lang", "source"), n = 3)
    val counts = got.groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect()
    assert(counts.length == 6 && counts.forall(_ == 3L))
    val ranks = got.groupBy("lang", "source")
      .agg(sort_array(collect_list("sample_rank")).as("r"))
      .select("r").as[Seq[Long]].collect()
    assert(ranks.forall(_ == Seq(1L, 2L, 3L)))
  }

  test("sampling is deterministic and md5-ordered") {
    val a = Sampling.stratifiedN(docs, Seq("lang"), n = 5)
      .select("doc_id", "sample_rank").as[(Long, Long)].collect().toSet
    val b = Sampling.stratifiedN(docs, Seq("lang"), n = 5)
      .select("doc_id", "sample_rank").as[(Long, Long)].collect().toSet
    assert(a == b)
    // reference: md5 of the id string, as the engine computes it
    val lang0 = (0 until 60).filter(_ % 2 == 0).map(_.toLong)
    val md5s = docs.filter($"lang" === "lang_0")
      .select($"doc_id", md5($"doc_id".cast("string")).as("m"))
      .as[(Long, String)].collect().sortBy(r => (r._2, r._1)).map(_._1).take(5)
    val got0 = Sampling.stratifiedN(docs.filter($"lang" === "lang_0"), Seq("lang"), 5)
      .orderBy("sample_rank").select("doc_id").as[Long].collect()
    assert(got0.toSeq == md5s.toSeq)
    assert(lang0.toSet.intersect(got0.toSet).size == 5)
  }

  test("quota larger than the stratum keeps the whole stratum") {
    val tiny = docs.filter($"doc_id" < 4)
    val got = Sampling.stratifiedN(tiny, Seq("lang"), n = 100)
    assert(got.count() == 4)
  }

  test("mixReport pairs totals with sampled counts") {
    val got = Sampling.mixReport(docs, Seq("lang"), n = 7)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("lang_0", 30L, 7L), ("lang_1", 30L, 7L)))
  }

  test("sliding windows cover every token with the declared overlap") {
    val one = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val got = Chunking.slidingWindows(one, window = 4, stride = 3)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 3L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 6L, 1L, "t6")))
  }

  test("short docs yield one full-coverage chunk; every token appears") {
    val d = Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    val got = Chunking.slidingWindows(d, window = 8, stride = 6)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L, 2L, "a b"), (2L, 0L, 0L, 1L, "x")))
  }

  test("sequence packing lays docs end-to-end with boundary straddling") {
    // single shard: token counts 3, 4, 2 into 5-token windows
    val d = Seq((0L, "a b c"), (8L, "d e f g"), (16L, "h i"))
      .toDF("doc_id", "text")
    val got = Chunking.packSequences(d, maxTokens = 5, shards = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 0L, 0L, 3L),    // starts window 0 at offset 0
      (8L, 0L, 0L, 3L, 4L),    // starts in window 0, straddles into 1
      (16L, 0L, 1L, 2L, 2L)))  // lands in window 1 after the straddle
  }

  test("shards pack independently and deterministically") {
    val d = (0 until 40).map(i => (i.toLong, ("tok " * (i % 5 + 1)).trim))
      .toDF("doc_id", "text")
    val got = Chunking.packSequences(d, maxTokens = 7, shards = 4)
    // per shard, offsets restart from zero and cums are consistent
    val byShard = got.as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(_._1))
    byShard.foreach { case (_, rows) =>
      assert(rows.head._4 == 0L)   // first doc of each shard at offset 0
      rows.sliding(2).foreach {
        case Array(a, b) =>
          val expectedCum = a._3 * 7 + a._4 + a._5
          assert(b._3 * 7 + b._4 == expectedCum)
        case _ =>
      }
    }
    assert(got.count() == 40)
  }

  test("chunk boundaries reconstruct the document when stride == window") {
    val one = Seq((9L, (0 until 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Chunking.slidingWindows(one, window = 4, stride = 4)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
    assert(got.mkString(" ") == (0 until 10).map(i => s"w$i").mkString(" "))
  }

  test("shard assignment is stable under corpus growth and covers every doc exactly once") {
    val base = docs.withColumn("n_chars", length(col("text")).cast("bigint"))
    val a = graft.operators.Curation.shardAssign(base, nShards = 8)
    // every doc gets exactly one shard in [0, 8)
    assert(a.count() == 60 &&
      a.filter(col("shard") >= 0 && col("shard") < 8).count() == 60)
    // growth stability: adding docs never moves an existing doc's shard
    // (rank-based sharding would reshuffle everything — the property
    // that makes incremental re-export possible)
    val grown = (0 until 120).map(i => (i.toLong, s"body $i"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val b = graft.operators.Curation.shardAssign(grown, nShards = 8)
      .filter(col("doc_id") < 60)
    val moved = a.select(col("doc_id"), col("shard").as("s1"))
      .join(b.select(col("doc_id"), col("shard").as("s2")), "doc_id")
      .filter(col("s1") =!= col("s2")).count()
    assert(moved == 0, "a document's shard must never change as the corpus grows")
  }

  test("writeShards produces one directory per shard, shard_key-ordered; manifest matches the files") {
    val base = docs.withColumn("n_chars", length(col("text")).cast("bigint"))
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    graft.operators.Curation.writeShards(base, out, nShards = 4)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map(_.getName).sorted
    assert(dirs.toSeq == (0 until 4).map(i => s"shard=$i"),
      dirs.mkString(","))
    val manifest = graft.operators.Curation.shardManifest(base, nShards = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    // re-read each shard directory: counts match the manifest, rows
    // are in shard_key order, first/last keys attest the read order
    (0 until 4).foreach { sh =>
      val rows = spark.read.parquet(s"$out/shard=$sh")
        .select("shard_key").as[String].collect()
      val (nDocs, _, firstKey, lastKey) = manifest(sh.toLong)
      assert(rows.length == nDocs, s"shard $sh count")
      assert(rows.sameElements(rows.sorted), s"shard $sh must be key-ordered")
      assert(rows.head == firstKey && rows.last == lastKey, s"shard $sh keys")
    }
    assert(manifest.values.map(_._1).sum == 60L, "no doc lost or duplicated")
  }
}
