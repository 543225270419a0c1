package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.operators.{Similarity, VectorIndex}
import graft.lake.TableLog

class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  /** 8 well-separated cluster directions, 40 members each with
    * deterministic jitter — ids interleave clusters so an id-based
    * batch split spreads every cluster across both batches. */
  private lazy val vectors = {
    val rows = for (i <- 0 until 320) yield {
      val g = (i / 2) % 8 // consecutive ids share a cluster → both
                          // parity halves cover every cluster
      val base = Array.fill(dim)(0.02f)
      base(g * 2) = 1.0f
      base((g * 2 + 1) % dim) = 0.3f + 0.001f * (i / 8)
      (i.toLong, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def freshRoot() =
    Files.createTempDirectory("graft_vidx").resolve("ix").toString

  test("addBatch never reassigns existing postings (assignment stability)") {
    val root = freshRoot()
    val first = vectors.filter(col("vec_id") % 2 === 0)
    val second = vectors.filter(col("vec_id") % 2 === 1)
    VectorIndex.build(spark, root, first, numCentroids = 8)
    val before = TableLog.read(spark, VectorIndex.postingsPath(root))
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    val (v, drift) = VectorIndex.addBatch(spark, root, second)
    assert(v == 2)
    val after = TableLog.read(spark, VectorIndex.postingsPath(root))
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(after.size == 320)
    // every original posting survives the append byte-identical
    before.foreach { case (id, cell) =>
      assert(after(id) == cell, s"vec $id moved cell $cell -> ${after(id)}")
    }
    // same-distribution batch: drift ratio near 1, no refit signal
    assert(!VectorIndex.needsRefit(drift), s"spurious drift $drift")
  }

  test("incremental index recall within tolerance of full refit") {
    val root = freshRoot()
    VectorIndex.build(spark, root,
      vectors.filter(col("vec_id") % 2 === 0), numCentroids = 8)
    VectorIndex.addBatch(spark, root, vectors.filter(col("vec_id") % 2 === 1))
    val queries = vectors.filter(col("vec_id") < 16)
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(vectors, queries, k))
    val incr = pairs(VectorIndex.search(spark, root, queries, k, nprobe = 2))
    val full = pairs(Similarity.ivfTopK(vectors, queries, k,
      numCentroids = 8, nprobe = 2))
    val recallIncr = (incr intersect truth).size.toDouble / truth.size
    val recallFull = (full intersect truth).size.toDouble / truth.size
    assert(recallIncr >= 0.7, s"incremental recall $recallIncr")
    assert(recallIncr >= recallFull - 0.15,
      s"incremental $recallIncr far below full-refit $recallFull")
  }

  test("drift detection: an alien batch trips the refit signal") {
    val root = freshRoot()
    VectorIndex.build(spark, root,
      vectors.filter(col("vec_id") % 2 === 0), numCentroids = 8)
    // alien distribution: sign-flipped dense vectors, far from every cell
    val alien = (1000L until 1040L).map { i =>
      (i, Array.tabulate(dim)(j =>
        if (j % 2 == 0) -1.0f else 1.0f * ((i % 5) + 1)).toSeq)
    }.toDF("vec_id", "embedding")
    val (_, drift) = VectorIndex.addBatch(spark, root, alien)
    assert(VectorIndex.needsRefit(drift), s"alien batch drift $drift not flagged")
  }

  test("optimize clusters postings by cell; search prunes unprobed cells' files") {
    val root = freshRoot()
    VectorIndex.build(spark, root,
      vectors.filter(col("vec_id") % 2 === 0), numCentroids = 8)
    VectorIndex.addBatch(spark, root, vectors.filter(col("vec_id") % 2 === 1))
    val queries = vectors.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val before = pairs(VectorIndex.search(spark, root, queries, k = 5))
    VectorIndex.optimize(spark, root, numFiles = 8)
    // pure layout rewrite: search results are unchanged
    val after = pairs(VectorIndex.search(spark, root, queries, k = 5))
    assert(after == before)
    // over Z-ordered layout a single-cell probe opens a strict subset
    // of files — the stats-pruned scan shape the index exists for
    val (kept, total) = TableLog.pruneReportIn(spark,
      VectorIndex.postingsPath(root), "cluster_id", Seq(0L))
    assert(total == 8, s"expected 8 optimized files, saw $total")
    assert(kept < total, s"single-cell probe kept $kept of $total files")
  }

  test("search time-travels: pre-batch version excludes the batch") {
    val root = freshRoot()
    VectorIndex.build(spark, root,
      vectors.filter(col("vec_id") % 2 === 0), numCentroids = 8)
    VectorIndex.addBatch(spark, root, vectors.filter(col("vec_id") % 2 === 1))
    val queries = vectors.filter(col("vec_id") < 4)
    val atV1 = VectorIndex.search(spark, root, queries, k = 5, nprobe = 8,
      version = Some(1))
    // version-1 postings hold only even ids — no odd neighbor can appear
    assert(atV1.filter(col("neighbor_id") % 2 === 1).count() == 0L)
    val latest = VectorIndex.search(spark, root, queries, k = 5, nprobe = 8)
    assert(latest.filter(col("neighbor_id") % 2 === 1).count() > 0L)
  }
}
