package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.lake.TableLog
import graft.operators.VectorIndex
import graft.streaming.VectorIngest

class VectorIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  private def clustered(ids: Range) = ids.map { i =>
    val g = (i / 2) % 8
    val base = Array.fill(dim)(0.02f)
    base(g * 2) = 1.0f
    // per-id jitter: ids close in value are close in cosine, so a
    // query near a streamed id must rank streamed neighbors first
    base((g * 2 + 1) % dim) = 0.3f + 0.0005f * i
    (i.toLong, base.toSeq)
  }.toDF("vec_id", "embedding")

  test("streamed batches land in the index; search sees them; replay is a no-op") {
    val root = Files.createTempDirectory("graft_vi")
    val ix = root.resolve("ix").toString
    val src = root.resolve("src").toString
    VectorIndex.build(spark, ix, clustered(0 until 160), numCentroids = 8)
    // two part files → two micro-batches of new vectors
    clustered(160 until 240).coalesce(1).write.mode("append").parquet(src)
    clustered(240 until 320).coalesce(1).write.mode("append").parquet(src)
    VectorIngest.admitEmbeddings(spark, src, ix,
      root.resolve("ckpt").toString, glob = "*.parquet",
      maxFilesPerTrigger = Some(1))
    val postings = TableLog.read(spark, VectorIndex.postingsPath(ix))
    assert(postings.count() == 320)
    assert(TableLog.history(spark, VectorIndex.postingsPath(ix))
      .count(_.action.startsWith("admit-")) == 2)
    // streamed vectors are findable: a query sitting at streamed id 300
    // must rank its (streamed) jitter-neighbors at the top
    val hits = VectorIndex.search(spark, ix,
      clustered(300 until 302), k = 5, nprobe = 8)
      .filter(col("neighbor_id") >= 160L).count()
    assert(hits > 0, "streamed vectors never surfaced in search")
    // manual replay of an absorbed batch id: nothing appended
    val (n, d) = VectorIngest.admitBatchOnce(spark,
      clustered(160 until 240), ix, batchId = 0L)
    assert(n == 0L && d.isNaN)
    assert(TableLog.read(spark, VectorIndex.postingsPath(ix)).count() == 320)
  }

  test("failOnDrift stops the stream on an alien batch") {
    val root = Files.createTempDirectory("graft_vi")
    val ix = root.resolve("ix").toString
    VectorIndex.build(spark, ix, clustered(0 until 160), numCentroids = 8)
    val alien = (1000L until 1040L).map { i =>
      (i, Array.tabulate(dim)(j =>
        if (j % 2 == 0) -1.0f else ((i % 5) + 1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      VectorIngest.admitBatchOnce(spark, alien, ix, batchId = 9L,
        failOnDrift = true)
    }
    assert(e.getMessage.contains("drift"))
    // the failed batch must not have been committed
    assert(!TableLog.history(spark, VectorIndex.postingsPath(ix))
      .exists(_.action == "admit-9"))
  }
}
